from ocr_auto_label_spark.datagen.transcripts import (  # noqa: F401
    generate_transcripts,
    replicated_transcripts,
    transcripts_parquet,
)
