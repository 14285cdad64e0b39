from clockpipe_spark.sources.registry import read_source, SOURCE_FORMATS  # noqa: F401
from clockpipe_spark.sources.jdbc_adapter import JdbcPostgresSource, PgColumn  # noqa: F401
