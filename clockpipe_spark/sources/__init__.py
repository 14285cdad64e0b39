from clockpipe_spark.sources.registry import read_source, SOURCE_FORMATS  # noqa: F401
