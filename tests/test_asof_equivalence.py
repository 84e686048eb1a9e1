"""Physical-strategy equivalence: the bucketed (explicitly salted) as-of
join must equal the plain union-window as-of join frame-for-frame — with a
bucket small enough (1h) that many buckets contain only probes and the
cross-bucket carry is exercised hard."""

from __future__ import annotations

import pandas as pd

from tests.conftest import SF_CORRECT


def test_bucketed_asof_equals_plain(spark):
    from uncharted_ta1_pipeline_spark.operators.asof import (
        asof_join,
        asof_join_bucketed,
    )
    from uncharted_ta1_pipeline_spark.plans.queries import asof_state
    from uncharted_ta1_pipeline_spark.sources.transcripts import (
        load_transcripts,
        make_probes,
    )

    t = load_transcripts(spark, SF_CORRECT)
    probes, state = make_probes(t), asof_state(t)
    cols = ["turn_idx", "last_role", "turns_incl", "tools_incl", "last_session_id"]
    plain = asof_join(probes, state, state_cols=cols).toPandas()
    bucketed = asof_join_bucketed(
        probes, state, state_cols=cols, bucket_s=3600
    ).toPandas()
    key = ["probe_id"]
    a = plain.sort_values(key).reset_index(drop=True)
    b = bucketed.sort_values(key).reset_index(drop=True)[a.columns]
    pd.testing.assert_frame_equal(a, b, check_like=True)
