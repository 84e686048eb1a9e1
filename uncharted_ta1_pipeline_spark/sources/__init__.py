from uncharted_ta1_pipeline_spark.sources.transcripts import (  # noqa: F401
    TRANSCRIPTS_CTE,
    PROBES_CTE,
    load_events,
    load_transcripts,
    make_probes,
    synth_transcripts,
)
