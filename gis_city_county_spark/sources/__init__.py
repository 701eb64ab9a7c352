from gis_city_county_spark.sources.tables import (  # noqa: F401
    CORE_TABLES,
    load_table,
    load_tables,
    register_views,
    table_path,
)
