"""``python -m golang_db_query_engine_elasticsearch_indexer_spark.api`` — serve on :8084."""

from golang_db_query_engine_elasticsearch_indexer_spark.api import main

main()
