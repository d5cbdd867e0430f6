"""End-to-end pipeline contract tests (FIXTURES.md F1/F4 shapes +
reference report/error contracts)."""

import pytest

from data_pipeline_agent_spark.pipeline.run import run_pipeline
from data_pipeline_agent_spark.pipeline.viz import generate_visualizations


@pytest.fixture(scope="module")
def f1_csv(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("f1") / "mixed.csv"
    import random

    rng = random.Random(42)
    with open(p, "w") as f:
        f.write("id,age,income,segment,signup_date,ghost,churn\n")
        for i in range(300):
            age = "" if i % 12 == 0 else f"{rng.gauss(45, 15):.1f}"
            seg = "" if i % 25 == 0 else ["gold", "silver", "bronze"][i % 3]
            churn = "yes" if rng.random() < 0.3 else "no"
            f.write(
                f"{i},{age},{rng.lognormvariate(10, 1):.2f},{seg},"
                f"2023-{1 + i % 12:02d}-{1 + i % 28:02d} 10:30:00,,{churn}\n"
            )
    return str(p)


def test_run_pipeline_report_contract(spark, f1_csv, tmp_path):
    html, model_path = run_pipeline(spark, f1_csv, "churn", model_dir=str(tmp_path))
    assert model_path is not None, html
    for section in (
        "Data Pipeline Report",
        "Data Cleaning",
        "Data Preview",
        "Model Performance",
        "AI Insights",
        "Visualizations",
        "Dataset Overview",
    ):
        assert section in html
    assert "LLM call failed" in html  # no GROQ key here: graceful degradation
    assert "data:image/svg+xml;base64," in html


def test_run_pipeline_error_contract(spark, f1_csv):
    html, model_path = run_pipeline(spark, f1_csv, "does_not_exist")
    assert model_path is None
    assert "Error in Pipeline" in html
    assert "not found" in html


def test_run_pipeline_none_input(spark):
    html, model_path = run_pipeline(spark, None, "x")
    assert model_path is None and "Please upload a file" in html


def test_visualizations_inventory(spark, tables):
    li = tables["lineitem"]
    figs = generate_visualizations(li, "l_quantity")
    titles = [t for t, _ in figs]
    assert titles[0] == "Dataset Overview"
    assert any(t.startswith("Target Distribution") for t in titles)
    assert "Feature Correlation" in titles
    assert sum(t.startswith("Feature ") for t in titles) >= 5
    import base64

    for _, payload in figs:
        svg = base64.b64decode(payload).decode()
        assert svg.startswith("<svg")


def test_api_gated_without_fastapi():
    from data_pipeline_agent_spark.serve.api import create_app

    try:
        import fastapi  # noqa: F401

        app = create_app()
        assert app is not None
    except ImportError:
        with pytest.raises(NotImplementedError, match="fastapi"):
            create_app()


def test_ui_gated_without_gradio():
    import pytest as _pytest

    from data_pipeline_agent_spark.serve.ui import create_gradio_app

    with _pytest.raises(NotImplementedError, match="gradio"):
        create_gradio_app()


def test_pwa_route_surface_parity():
    """The PWA/static surface (reference api.py:127-203) must be declared:
    manifest/service-worker constants match the reference's content shape,
    and when fastapi IS installed the app exposes every route the
    reference web UI fetches on load."""
    from data_pipeline_agent_spark.serve import api as api_mod

    assert api_mod.MANIFEST["name"] == "Data Pipeline Agent"
    assert api_mod.MANIFEST["start_url"] == "/gradio"
    assert {"short_name", "display", "background_color", "theme_color"} <= set(
        api_mod.MANIFEST
    )
    assert "addEventListener('fetch'" in api_mod.SERVICE_WORKER_JS

    try:
        import fastapi  # noqa: F401
    except ImportError:
        return  # construction gate covered by test_api_gated_without_fastapi
    app = api_mod.create_app()
    paths = {getattr(r, "path", None) for r in app.routes}
    for expected in [
        "/favicon.ico",
        "/manifest.json",
        "/sw.js",
        "/gradio/gradio_api/upload_progress",
        "/gradio/gradio_api/app_id",
        "/.well-known/appspecific/com.chrome.devtools.json",
    ]:
        assert expected in paths, f"missing PWA route {expected}"


def test_kde_grid_matches_gaussian_kde(spark):
    """kde_grid == the textbook Gaussian KDE (1/(n*h)) * sum phi((x-xi)/h)
    at Scott's bandwidth, evaluated with numpy on the same fixture."""
    import math

    import numpy as np

    from data_pipeline_agent_spark.operators.stats import kde_grid

    vals = [1.0, 2.0, 2.5, 3.0, 3.5, 4.0, 4.5, 5.0, 7.0, 9.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    grid = kde_grid(df, "x", n_points=16)
    assert len(grid) == 16
    xs = np.array([p[0] for p in grid])
    assert xs[0] == 1.0 and xs[-1] == 9.0

    a = np.array(vals)
    n = len(a)
    h = a.std(ddof=1) * n ** (-0.2)  # Scott's rule, sample stddev
    expect = np.array(
        [
            (1.0 / (n * h * math.sqrt(2 * math.pi)))
            * np.exp(-0.5 * ((x - a) / h) ** 2).sum()
            for x in xs
        ]
    )
    got = np.array([p[1] for p in grid])
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_kde_grid_degenerate_cases(spark):
    from data_pipeline_agent_spark.operators.stats import kde_grid

    const = spark.createDataFrame([(5.0,), (5.0,)], "x double")
    assert kde_grid(const, "x") == []
    empty = spark.createDataFrame([], "x double")
    assert kde_grid(empty, "x") == []


def test_histogram_figures_carry_kde_polyline(spark):
    import base64

    from data_pipeline_agent_spark.pipeline.viz import generate_visualizations

    import random

    rng = random.Random(3)
    df = spark.createDataFrame(
        [(float(rng.gauss(0, 1)),) for _ in range(300)], "f double"
    )
    figs = generate_visualizations(df)
    feat = [p for t, p in figs if t.startswith("Feature 1")]
    assert feat
    svg = base64.b64decode(feat[0]).decode()
    assert "<polyline" in svg  # the KDE overlay is drawn
