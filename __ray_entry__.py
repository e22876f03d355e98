"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship transcript CDC pipeline on a deterministic
synthetic fixture at sf0.001 scale; ``queries()``/``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 plus the training-data ops, against the
driver's parquet tables.

Ray is initialised by the driver BEFORE this module is imported: nothing here
(or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: changelog-tail -> lake
    upsert with LWW merge, salted hot keys, manifest checkpoint; returns the
    merged transcript table."""
    from kafka_connect_s3_ray.pipelines.queries import q_cdc_transcripts

    res = q_cdc_transcripts("/root/testdata/sf0.001")
    # contract is Dataset | pandas.DataFrame; the pipeline returns the
    # merged table as pyarrow (bounded at this sf), so hand back a DataFrame
    return res.to_pandas() if hasattr(res, "to_pandas") else res


def queries() -> dict[str, Callable[[str], Any]]:
    from kafka_connect_s3_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from kafka_connect_s3_ray.pipelines.queries import (
        ORACLE_SQL,
        cdc_transcripts_oracle_sql,
        conversation_rebuild_oracle_sql,
        conversation_stats_oracle_sql,
        dialog_integrity_oracle_sql,
        image_near_dup_oracle_sql,
        media_features_oracle_sql,
        media_oracle_fixture,
        sft_curation_oracle_sql,
        turn_pairs_oracle_sql,
        transcripts_fixture,
        video_frames_oracle_sql,
    )

    # The cdc_transcripts oracle (and the conversation_stats rollup over the
    # same replay) reads the deterministic transcripts fixture from /tmp;
    # build it up-front (pure pyarrow/numpy, seed=42 — no Ray involvement)
    # so the SQL is runnable regardless of query/oracle order, and
    # instantiate the SQL from the fixture's ACTUAL root so path and fixture
    # can never diverge.
    fx = transcripts_fixture("/root/testdata/sf0.01")
    out = dict(ORACLE_SQL)
    out["cdc_transcripts"] = cdc_transcripts_oracle_sql(fx["root"])
    out["conversation_stats"] = conversation_stats_oracle_sql(fx["root"])
    out["incremental_view"] = conversation_stats_oracle_sql(fx["root"])
    out["conversation_rebuild"] = conversation_rebuild_oracle_sql(fx["root"])
    out["dialog_integrity"] = dialog_integrity_oracle_sql(fx["root"])
    out["turn_pairs"] = turn_pairs_oracle_sql(fx["root"])
    out["sft_curation"] = sft_curation_oracle_sql(fx["root"])
    # multimodal oracles: driver-side sequential decode of the deterministic
    # sf0.01 media corpora to per-unit integer rows (pure numpy, cached in
    # /tmp); the SQL aggregates — and for video, re-derives the frame
    # selection — independently, comparing integer-exact decode sums
    mx = media_oracle_fixture()
    out["media_features"] = media_features_oracle_sql(mx)
    out["video_frames"] = video_frames_oracle_sql(mx)
    out["image_near_dup"] = image_near_dup_oracle_sql(mx)
    return out
