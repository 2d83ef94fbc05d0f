import shutil
import tempfile

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[8]")
        .appName("bayard_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tmp_index_root():
    d = tempfile.mkdtemp(prefix="bayard_idx_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def built(spark, tmp_index_root):
    import numpy as np
    from bayard_spark.build.indexer import IndexBuilder
    from bayard_spark.oracle import OracleIndex
    from bayard_spark.query import SearchEngine
    from bayard_spark.schema import webtext_index_meta
    from bayard_spark.sources.webtext import synthesize_batch, webtext_df
    N_DOCS = 600

    meta = webtext_index_meta(
        num_buckets=8, num_waves=2, salt_span=100, hot_df_threshold=250
    )
    src = webtext_df(spark, N_DOCS, partitions=8)
    builder = IndexBuilder(spark, meta, tmp_index_root)
    builder.build(src)
    engine = SearchEngine(spark, tmp_index_root)

    # oracle over the SAME docs (synthesize driver-side, same seed)
    pdf = synthesize_batch(np.arange(N_DOCS))
    # replicate upsert+id assignment: urls unique here, ids by engine's docs
    docs = {
        r["url"]: r["doc_id"]
        for r in spark.read.parquet(builder.paths.docs)
        .select("url", "doc_id")
        .collect()
    }
    oracle = OracleIndex(
        analyzers=engine.analyzers,
        field_analyzers={"url": "raw", "text": "default", "lang": "raw"},
    )
    for row in pdf.itertuples(index=False):
        oracle.add(
            docs[row.url],
            {"url": row.url, "text": row.text, "lang": row.lang},
        )
    return engine, oracle


