from gis_city_county_spark.operators.relational import (  # noqa: F401
    bulk_rename,
    fix_individual,
    join_field,
    merge_by_name,
    rename_fields,
    value_map,
)
