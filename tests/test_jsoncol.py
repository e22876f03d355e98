"""json_extract: the newline-framed vectorized parse must behave like SQL
json_extract — typed columns, NULL for missing keys and NULL rows, loud
errors for malformed payloads (never silent misalignment)."""

import pyarrow as pa
import pytest

from kafka_connect_s3_ray.functions.jsoncol import json_extract


def _t(vals):
    return pa.table({"id": pa.array(range(len(vals)), pa.int64()),
                     "props": pa.array(vals, pa.string())})


def test_extracts_typed_fields():
    out = json_extract(_t(['{"k": 7, "s": "x"}', '{"k": -2}']),
                       "props", {"k": pa.int64(), "s": pa.string()})
    assert out.column("k").to_pylist() == [7, -2]
    assert out.column("s").to_pylist() == ["x", None]
    assert out.column("k").type == pa.int64()
    assert "props" in out.column_names  # drop defaults to False


def test_null_row_and_missing_key_yield_null():
    out = json_extract(_t([None, "{}", '{"k": 1}']), "props",
                       {"k": pa.int64()}, drop=True)
    assert out.column("k").to_pylist() == [None, None, 1]
    assert "props" not in out.column_names


def test_all_null_batch_keeps_types():
    out = json_extract(_t([None, None]), "props", {"k": pa.int64()})
    assert out.column("k").type == pa.int64()
    assert out.column("k").null_count == 2


def test_empty_batch():
    out = json_extract(_t([]), "props", {"k": pa.int64()})
    assert len(out) == 0 and out.column("k").type == pa.int64()


def test_malformed_json_raises():
    with pytest.raises(ValueError, match="malformed"):
        json_extract(_t(['{"k": }']), "props", {"k": pa.int64()})


def test_pretty_printed_objects_still_align():
    # Arrow's JSON reader is block-based, not strict NDJSON: an object
    # spanning lines parses as ONE row, so framing survives pretty-printing
    out = json_extract(_t(['{\n  "k": 1\n}', '{"k": 2}']), "props",
                       {"k": pa.int64()})
    assert out.column("k").to_pylist() == [1, 2]


def test_raw_newline_in_string_value_raises():
    # a literal newline inside a JSON string is invalid JSON; the parse
    # fails loudly instead of silently misaligning rows
    with pytest.raises(ValueError):
        json_extract(_t(['{"s": "a\nb", "k": 1}', '{"k": 2}']), "props",
                     {"k": pa.int64()})


def test_multi_object_plus_blank_cell_cannot_cancel():
    # a concatenated-objects cell (+1 parsed row) and a blank cell (-1,
    # skipped by the block reader) would balance the row count and silently
    # misalign; the blank cell must be rejected upfront as malformed
    with pytest.raises(ValueError, match="whitespace-only"):
        json_extract(_t(['{"k": 1} {"k": 2}', '']), "props",
                     {"k": pa.int64()})
    with pytest.raises(ValueError, match="whitespace-only"):
        json_extract(_t([' \t ']), "props", {"k": pa.int64()})
    # without a cancelling blank, the count check itself fires
    with pytest.raises(ValueError, match="concatenates"):
        json_extract(_t(['{"k": 1} {"k": 2}']), "props", {"k": pa.int64()})


def test_field_name_collision_raises():
    with pytest.raises(ValueError, match="collide"):
        json_extract(_t(['{"id": 9}']), "props", {"id": pa.int64()})
    # dropping the source column frees its name
    out = json_extract(_t(['{"props": 3}']), "props",
                       {"props": pa.int64()}, drop=True)
    assert out.column("props").to_pylist() == [3]


def test_all_null_field_group_sums_to_sql_null(tmp_path):
    """q_json_props_agg must emit NULL (not 0) for a group whose extracted
    field is always missing — SQL sum-over-nulls semantics."""
    import duckdb
    import pyarrow.parquet as pq

    import kafka_connect_s3_ray.pipelines.queries as Q

    t = pa.table({
        "event_id": pa.array(range(6), pa.int64()),
        "ts": pa.array([0] * 6, pa.timestamp("us")),
        "user_id": pa.array([1] * 6, pa.int64()),
        "event_type": pa.array(["a", "a", "b", "b", "c", "c"], pa.string()),
        "value": pa.array([0.0] * 6, pa.float64()),
        "props": pa.array(['{"k": 3}', '{"k": 4}', "{}", "{}",
                           '{"k": 1}', "{}"], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = Q.q_json_props_agg(str(tmp_path)).to_pydict()
    assert got == {"event_type": ["a", "b", "c"], "n": [2, 2, 2],
                   "sum_k": [7, None, 1]}
    exp = duckdb.sql(
        Q.ORACLE_SQL["json_props_agg"].replace(
            "FROM events", f"FROM read_parquet('{tmp_path}/events.parquet')")
    ).df()
    assert [None if v != v else int(v) for v in exp["sum_k"]] == [7, None, 1]


def test_matches_duckdb_json_extract():
    import duckdb

    vals = ['{"k": 5}', '{"k": 0}', "{}", None, '{"k": 123, "z": "q"}']
    out = json_extract(_t(vals), "props", {"k": pa.int64()})
    exp = duckdb.sql(
        "SELECT CAST(json_extract(p, '$.k') AS BIGINT) AS k "
        "FROM (SELECT unnest(?) AS p)", params=[vals]).df()["k"]
    assert out.column("k").to_pylist() == [
        None if v != v else int(v) for v in exp]
