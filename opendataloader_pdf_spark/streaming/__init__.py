from opendataloader_pdf_spark.streaming.tail import tail_available_now  # noqa: F401
