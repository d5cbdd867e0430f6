"""LLM insight step — reference parity for call_gpt_oss_120b
(/root/reference/main.py:38-61): POST to the Groq OpenAI-compatible
endpoint, temperature 0.2, max_tokens 2048, 60s timeout; ANY failure
(missing key, network, HTTP error) degrades to the string
"LLM call failed: {e}" — the pipeline never fails on the LLM step.

stdlib urllib (no requests dependency in this container).
"""

from __future__ import annotations

import json
import os
import urllib.request

GROQ_URL = "https://api.groq.com/openai/v1/chat/completions"
MODEL = "openai/gpt-oss-120b"


def llm_insight(prompt: str, timeout: int = 60) -> str:
    try:
        api_key = os.environ["GROQ_API_KEY"]
        req = urllib.request.Request(
            GROQ_URL,
            data=json.dumps(
                {
                    "model": MODEL,
                    "messages": [{"role": "user", "content": prompt}],
                    "temperature": 0.2,
                    "max_tokens": 2048,
                }
            ).encode(),
            headers={
                "Authorization": f"Bearer {api_key}",
                "Content-Type": "application/json",
            },
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            body = json.loads(resp.read().decode())
        return body["choices"][0]["message"]["content"]
    except Exception as e:  # graceful-degradation contract (main.py:60-61)
        return f"LLM call failed: {e}"
