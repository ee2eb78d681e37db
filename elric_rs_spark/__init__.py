"""elric_rs_spark — a PySpark-native analytics engine with the
capabilities of semiotic-ai/elric-rs, re-expressed Spark-first.

The reference (/root/reference, elric-rs v1.4.0) is a Rust streaming ETL
loader: gRPC block stream -> typed row casting -> finality/reorg buffer ->
ClickHouse streaming inserts with cursor checkpointing. This package
rebuilds those semantics on the Spark DataFrame / Structured Streaming
stack and adds the relational + LLM-training-data-pipeline surface a
100 TB deployment needs (joins, aggregates, windows, dedup, similarity
search, text analysis, multimodal plumbing).

Layout:
    session.py    SparkSession builder tuned for scale (AQE, Arrow, UTC)
    tables.py     fixture table loading / view registration
    types.py      ClickHouse type-string -> Spark DataType (ref table_info.rs)
    cast.py       all-strings row -> typed columns (ref table_info.rs:73-168)
    operators/    relational + pipeline operators (each a queries() entry)
    streaming/    block source, finality buffer, undo, sink, cursor
    functions/    reusable column expressions (cosine, tokens, minhash...)
"""

__version__ = "0.1.0"
