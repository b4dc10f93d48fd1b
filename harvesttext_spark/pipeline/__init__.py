from harvesttext_spark.pipeline.pages import synthesize_pages  # noqa: F401
from harvesttext_spark.pipeline.quality_filter import quality_filter  # noqa: F401
