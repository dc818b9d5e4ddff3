from opendataloader_pdf_spark.streaming.tail import tail_available_now  # noqa: F401
from opendataloader_pdf_spark.streaming.windows import (  # noqa: F401
    run_windowed_activity,
    windowed_activity,
)
from opendataloader_pdf_spark.streaming.stateful import (  # noqa: F401
    link_continuations_stream,
    run_link_continuations,
)
