"""uncharted_ta1_pipeline_spark — a PySpark-native point-in-time feature engine.

A brand-new engine (NOT a port) that re-expresses the staged
extract -> enrich -> georeference dataflow of jataware/uncharted-ta1-pipeline
as an as-of-join + windowed feature-engineering factory over tables of
multi-turn agent transcripts:

    conv_id:string, turn_idx:int, role:string, text:string,
    tool:string, ts:timestamp

Design (see SURVEY.md for the full reference mapping):

- every stage is a pure ``DataFrame -> DataFrame`` function (the reference's
  blackboard ``Dict[str, Any]`` per document, /root/reference/tasks/common/
  pipeline.py:138-199, becomes a wide DataFrame per stage);
- all sequence analytics are ``pyspark.sql.Window`` with frames ending at
  ``-1`` (strictly past) so no feature can see its own or any future turn
  (zero temporal leakage);
- custom compute is vectorized Arrow/pandas UDFs only — no per-row Python;
- stage outputs are written through a manifest/checkpoint layer mirroring
  the reference's per-task content-addressed cache
  (/root/reference/tasks/common/task.py:188-212), so runs resume from the
  last committed partition;
- hot conversations are salted explicitly (two-level aggregation) rather
  than relying on AQE alone.
"""

__version__ = "0.1.0"

from uncharted_ta1_pipeline_spark.session import get_spark  # noqa: F401
