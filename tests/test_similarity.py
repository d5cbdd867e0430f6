"""IVF approximate-NN tests: recall floor vs brute force; exact when
probing every cell."""

def test_ivf_recall_vs_bruteforce(spark):
    from pyspark.sql import functions as F

    from data_pipeline_agent_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    anchors = emb.where(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, anchors, k=5)
    approx = ivf_topk(emb, anchors, k=5, n_centroids=8, nprobe=3)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, recall
    # exact when probing every cell
    full = ivf_topk(emb, anchors, k=5, n_centroids=8, nprobe=8)
    f = {(r["query_id"], r["neighbor_id"]) for r in full.collect()}
    assert f == e
