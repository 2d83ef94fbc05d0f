"""Large-scale training-data pipeline operations.

Beyond the reference's search operators: deduplication, similarity search,
text analysis, and multimodal column plumbing — the ops a 100 TB pretraining
corpus pipeline needs, built Spark-first (JVM expressions where possible,
Arrow-batch UDFs where not).
"""
