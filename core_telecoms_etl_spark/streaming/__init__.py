from core_telecoms_etl_spark.streaming.events import (
    run_stream_tumbling,
    sessionize,
    tumbling_agg,
)

__all__ = ["run_stream_tumbling", "sessionize", "tumbling_agg"]
