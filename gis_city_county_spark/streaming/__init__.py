from gis_city_county_spark.streaming.events import (  # noqa: F401
    sessionize,
    windowed_agg,
)
