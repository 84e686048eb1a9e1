"""Source/sink round-trips (JSON/CSV) and the CLI batch driver — the two
§2.1 rows the round-1 verdict flagged as implemented-but-untested."""

from __future__ import annotations

import json

import pandas as pd

from tests.conftest import SF_SMOKE


def _canon(df) -> pd.DataFrame:
    pdf = df.toPandas()
    key = ["conv_id", "turn_idx"]
    pdf = pdf.sort_values(key).reset_index(drop=True)
    return pdf[sorted(pdf.columns)]


def test_json_round_trip(spark, tmp_path):
    """write_json -> read_transcripts(json) preserves every row, including
    byte-identical text and exact timestamps."""
    from uncharted_ta1_pipeline_spark.sources.readers import (
        read_transcripts,
        write_json,
    )
    from uncharted_ta1_pipeline_spark.sources.transcripts import load_transcripts

    t = load_transcripts(spark, SF_SMOKE)
    path = str(tmp_path / "json_out")
    write_json(t, path, n_files=3)
    back = read_transcripts(spark, path, fmt="json")
    a, b = _canon(t), _canon(back)
    pd.testing.assert_frame_equal(a, b[a.columns], check_like=True)


def test_read_transcripts_validates_schema(spark, tmp_path):
    import pytest

    from uncharted_ta1_pipeline_spark.sources.readers import read_transcripts

    bad = str(tmp_path / "bad.parquet")
    spark.range(3).write.parquet(bad)
    with pytest.raises(ValueError, match="missing columns"):
        read_transcripts(spark, bad, fmt="parquet")


def test_cli_end_to_end_and_resume(spark, tmp_path, capsys):
    """CLI driver: full feature materialization through the manifest layer;
    a second identical run resumes (skips all committed buckets) and
    reproduces the same output."""
    from uncharted_ta1_pipeline_spark.cli import main
    from uncharted_ta1_pipeline_spark.sources.transcripts import load_transcripts

    inp = str(tmp_path / "transcripts.parquet")
    load_transcripts(spark, SF_SMOKE).write.parquet(inp)
    workdir = str(tmp_path / "work")

    rc = main(
        ["--input", inp, "--workdir", workdir, "--buckets", "8"], spark=spark
    )
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out1["rows_out"] > 0

    rc = main(
        ["--input", inp, "--workdir", workdir, "--buckets", "8"], spark=spark
    )
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out2["rows_out"] == out1["rows_out"]
