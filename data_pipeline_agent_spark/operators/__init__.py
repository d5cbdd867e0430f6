"""Pure DataFrame operators.

Each operator is a small function ``DataFrame -> DataFrame`` (or
``DataFrame -> small driver-side value``), composable and lazily planned so
Catalyst can fuse/prune. Reference-parity operators cite the behavior they
replicate as ``main.py:line`` into /root/reference.
"""

from data_pipeline_agent_spark.operators.cleaning import clean_data  # noqa: F401
from data_pipeline_agent_spark.operators.profiling import profile  # noqa: F401
