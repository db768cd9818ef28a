from live_data_spark.functions.dialect import (  # noqa: F401
    decode,
    deterministic_sample,
    exclude,
    gaussian_pdf,
    weighted_choice,
)
