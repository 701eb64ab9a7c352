from gis_city_county_spark.functions.numeric import dec_avg, dec_sum  # noqa: F401
from gis_city_county_spark.functions.text import (  # noqa: F401
    drop_first_words,
    drop_last_word,
    last_word_title,
    nullif_empty,
    strip_tokens,
    zero_pad_concat,
)
