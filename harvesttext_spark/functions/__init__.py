from harvesttext_spark.functions.cleaning import (  # noqa: F401
    clean_text_py,
    make_clean_text_udf,
    clean_text_native,
)
