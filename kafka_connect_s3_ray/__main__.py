"""CLI entry points — run locally or via ``ray job submit``:

    python -m kafka_connect_s3_ray upsert --changelog DIR --out DIR --manifest F
        [--lake DIR] [--partitions N] [--hot-keys auto|k1,k2] [--mode auto]
    python -m kafka_connect_s3_ray tail --changelog DIR --out DIR --manifest F
        [--rounds N] [--poll-interval S]
    python -m kafka_connect_s3_ray synth --root DIR [--conv N] [--events N]
    python -m kafka_connect_s3_ray metrics --manifest F

The CLI owns the Ray session (``ray.init`` guarded / ``ray.shutdown``); library
code never initialises Ray itself (driver contract).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _init_ray() -> bool:
    """Guarded init; returns True when THIS call initialized Ray (the caller
    then owns the shutdown — a CLI command invoked inside an existing Ray
    session, e.g. from a test or a notebook, must not tear that session
    down)."""
    import ray

    owns = not ray.is_initialized()
    if owns:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext

        # only configure a session we created — a host session's settings
        # (e.g. progress bars in a notebook) are not ours to change
        DataContext.get_current().enable_progress_bars = False
    return owns


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="kafka_connect_s3_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    up = sub.add_parser("upsert", help="one incremental changelog->lake upsert round")
    up.add_argument("--changelog", required=True)
    up.add_argument("--out", required=True)
    up.add_argument("--manifest", required=True)
    up.add_argument("--lake", default=None)
    up.add_argument("--partitions", type=int, default=16)
    up.add_argument("--hot-keys", default=None,
                    help="'auto' or comma-separated conv_ids to salt")
    up.add_argument("--salts", type=int, default=8)
    up.add_argument("--mode", default="auto",
                    choices=["auto", "copartitioned", "shuffle"])
    up.add_argument("--commit-mode", default="rewrite",
                    choices=["rewrite", "delta"])

    tl = sub.add_parser("tail", help="continuous changelog tailing")
    tl.add_argument("--changelog", required=True)
    tl.add_argument("--out", required=True)
    tl.add_argument("--manifest", required=True)
    tl.add_argument("--lake", default=None)
    tl.add_argument("--partitions", type=int, default=16)
    tl.add_argument("--rounds", type=int, default=None)
    tl.add_argument("--poll-interval", type=float, default=10.0)
    tl.add_argument("--commit-mode", default="rewrite",
                    choices=["rewrite", "delta"])
    tl.add_argument("--compact-every", type=int, default=None,
                    help="with delta commits: fold deltas into the base every N rounds")
    tl.add_argument("--flush-interval-rounds", type=int, default=None,
                    help="W4 grace flush: fold an idle partition's pending "
                         "deltas after interval+grace ticks")
    tl.add_argument("--grace-rounds", type=int, default=None,
                    help="grace period in ticks (default: interval/2)")
    tl.add_argument("--flush-interval-ms", type=float, default=None,
                    help="W4 grace flush in WALL-CLOCK ms (the reference's "
                         "rotate.schedule semantics); mutually exclusive "
                         "with --flush-interval-rounds")
    tl.add_argument("--grace-ms", type=float, default=None,
                    help="wall-clock grace in ms (default: interval/2)")

    cp = sub.add_parser("compact", help="fold pending delta commits into base files")
    cp.add_argument("--manifest", required=True)
    cp.add_argument("--out", required=True)

    sy = sub.add_parser("synth", help="write a deterministic transcript fixture")
    sy.add_argument("--root", required=True)
    sy.add_argument("--conv", type=int, default=1000)
    sy.add_argument("--events", type=int, default=40000)
    sy.add_argument("--partitions", type=int, default=16)
    sy.add_argument("--seed", type=int, default=42)

    me = sub.add_parser("metrics", help="print engine metrics from a manifest")
    me.add_argument("--manifest", required=True)

    va = sub.add_parser("validate", help="check lake invariants from a manifest")
    va.add_argument("--manifest", required=True)

    vc = sub.add_parser("vacuum", help="GC old partition-file generations")
    vc.add_argument("--manifest", required=True)
    vc.add_argument("--keep", type=int, default=1)
    vc.add_argument("--dry-run", action="store_true")

    sn = sub.add_parser("snapshots", help="list the manifest's retained commit log")
    sn.add_argument("--manifest", required=True)

    lk = sub.add_parser("lookup", help="point-read one conversation (or turn) "
                                       "from the lake, optionally time-traveled")
    lk.add_argument("--manifest", required=True)
    lk.add_argument("--conv-id", required=True)
    lk.add_argument("--turn", type=int, default=None)
    lk.add_argument("--snapshot", type=int, default=None)

    st = sub.add_parser("stats", help="per-conversation analytics over the "
                                      "committed lake (turns, role mix, "
                                      "tool usage, token volume)")
    st.add_argument("--manifest", required=True)
    st.add_argument("--out", default=None,
                    help="parquet file for the per-conversation table "
                         "(default: print the corpus-level summary only)")
    st.add_argument("--snapshot", type=int, default=None,
                    help="commit id to time-travel to (negative = from latest)")

    qr = sub.add_parser("query", help="run one catalog pipeline by name "
                                      "over a testdata directory (list "
                                      "names with --list)")
    qr.add_argument("--name", default=None,
                    help="catalog entry (one of queries()'s keys)")
    qr.add_argument("--sf", default=None,
                    help="table directory holding the parquet inputs "
                         "(required unless --list)")
    qr.add_argument("--out", default=None,
                    help="parquet file for the result (default: print row "
                         "count + first rows as JSON)")
    qr.add_argument("--limit", type=int, default=5,
                    help="rows to include in the printed preview")
    qr.add_argument("--list", action="store_true",
                    help="print the catalog names and exit")

    pf = sub.add_parser("profile", help="per-column data-quality audit of "
                                        "the committed lake (rows, NULLs, "
                                        "exact distinct, numeric min/max)")
    pf.add_argument("--manifest", required=True)
    pf.add_argument("--out", default=None,
                    help="parquet file for the full profile table "
                         "(default: print the JSON summary only)")
    pf.add_argument("--snapshot", type=int, default=None,
                    help="commit id to time-travel to (negative = from latest)")

    vw = sub.add_parser("view-refresh",
                        help="build or incrementally refresh the materialized "
                             "per-conversation rollup view: only partitions "
                             "whose watermark moved since the last refresh "
                             "are recomputed")
    vw.add_argument("--manifest", required=True)
    vw.add_argument("--view-dir", required=True)
    vw.add_argument("--rebuild", action="store_true",
                    help="forget prior view state and recompute everything")

    ex = sub.add_parser("export", help="write the lake (current or a historical "
                                       "snapshot) to a parquet directory")
    ex.add_argument("--manifest", required=True)
    ex.add_argument("--out", required=True)
    ex.add_argument("--snapshot", type=int, default=None,
                    help="commit id to time-travel to (negative = from latest)")
    ex.add_argument("--format", choices=("parquet", "jsonl"),
                    default="parquet",
                    help="output format (jsonl = one JSON object per line, "
                         "the training-data interchange default)")

    tp = sub.add_parser("export-pairs", help="mine (prompt, response) SFT "
                                             "pairs from the lake and write "
                                             "them as parquet")
    tp.add_argument("--manifest", required=True)
    tp.add_argument("--out", required=True)
    tp.add_argument("--snapshot", type=int, default=None,
                    help="commit id to time-travel to (negative = from latest)")
    tp.add_argument("--format", choices=("parquet", "jsonl"),
                    default="parquet",
                    help="output format (jsonl = one JSON object per line, "
                         "the training-data interchange default)")

    pk = sub.add_parser("pack", help="greedy sequence packing of a documents "
                                     "parquet into fixed-token-budget training "
                                     "shards (partitioned, resumable output)")
    pk.add_argument("--docs", required=True, help="documents parquet file/dir")
    pk.add_argument("--out", required=True)
    pk.add_argument("--budget", type=int, default=512)
    pk.add_argument("--part-size", type=int, default=65536,
                    help="doc-id range per packing partition (= output shard)")
    pk.add_argument("--group-col", default=None,
                    help="pack per group (seq_id restarts per group)")
    pk.add_argument("--id-col", default="doc_id")
    pk.add_argument("--text-col", default="text")

    ck = sub.add_parser("chunk", help="overlapping token-window chunking of "
                                      "a documents parquet (RAG/embedding "
                                      "prep) to parquet or JSONL")
    ck.add_argument("--docs", required=True, help="documents parquet file/dir")
    ck.add_argument("--out", required=True)
    ck.add_argument("--size", type=int, default=32,
                    help="tokens per chunk window")
    ck.add_argument("--stride", type=int, default=24,
                    help="tokens between window starts (overlap = size-stride)")
    ck.add_argument("--id-col", default="doc_id")
    ck.add_argument("--text-col", default="text")
    ck.add_argument("--format", choices=("parquet", "jsonl"),
                    default="parquet")

    sb = sub.add_parser("seen-build", help="build a persisted seen-content "
                                           "index from a documents parquet")
    sb.add_argument("--docs", required=True, help="documents parquet file/dir")
    sb.add_argument("--index", required=True, help="index directory")
    sb.add_argument("--buckets", type=int, default=64)
    sb.add_argument("--text-col", default="text")

    sf_ = sub.add_parser("seen-filter", help="emit only rows of a new batch "
                                             "whose content is NOT in the "
                                             "seen index (incremental dedup)")
    sf_.add_argument("--docs", required=True, help="incoming batch parquet")
    sf_.add_argument("--index", required=True)
    sf_.add_argument("--out", default=None,
                     help="parquet dir for unseen rows (default: count only)")
    sf_.add_argument("--text-col", default="text")
    sf_.add_argument("--update", action="store_true",
                     help="append this batch's fingerprints to the index "
                          "after filtering (ingest-then-remember loop)")

    sc = sub.add_parser("seen-compact", help="fold a seen/near-seen index's "
                                             "generation files into single "
                                             "base parts per bucket")
    sc.add_argument("--index", required=True)

    nb = sub.add_parser("near-seen-build", help="build a persisted "
                                                "MinHash-LSH near-dup index")
    nb.add_argument("--docs", required=True)
    nb.add_argument("--index", required=True)
    nb.add_argument("--text-col", default="text")

    nf = sub.add_parser("near-seen-filter", help="emit only rows of a new "
                                                 "batch with NO verified "
                                                 "near-dup in the index")
    nf.add_argument("--docs", required=True)
    nf.add_argument("--index", required=True)
    nf.add_argument("--threshold", type=float, default=0.6)
    nf.add_argument("--out", default=None)
    nf.add_argument("--text-col", default="text")
    nf.add_argument("--update", action="store_true",
                    help="append the SURVIVORS to the index after filtering")

    eb = sub.add_parser("emb-seen-build", help="build a persisted IVF "
                                               "embedding index for "
                                               "incremental SEMANTIC dedup")
    eb.add_argument("--vecs", required=True, help="embeddings parquet")
    eb.add_argument("--index", required=True)
    eb.add_argument("--clusters", type=int, default=16)
    eb.add_argument("--id-col", default="vec_id")
    eb.add_argument("--vec-col", default="embedding")

    ef = sub.add_parser("emb-seen-filter", help="emit only rows of a new "
                                                "batch with NO history "
                                                "vector at cosine >= "
                                                "threshold")
    ef.add_argument("--vecs", required=True)
    ef.add_argument("--index", required=True)
    ef.add_argument("--threshold", type=float, default=0.5)
    ef.add_argument("--nprobe", type=int, default=None,
                    help="clusters probed per vector (default: all = exact)")
    ef.add_argument("--out", default=None)
    ef.add_argument("--update", action="store_true",
                    help="append the SURVIVORS to the index after filtering")

    rp = sub.add_parser("repartition", help="explicit lake re-shard: rebuild "
                                            "the CURRENT snapshot at a new "
                                            "partition count (the sanctioned "
                                            "way to change P; upsert refuses "
                                            "a silent change)")
    rp.add_argument("--manifest", required=True)
    rp.add_argument("--out-lake", required=True,
                    help="directory for the new part=<p>/ base files; start a "
                         "new changelog epoch against it with a fresh manifest")
    rp.add_argument("--partitions", type=int, required=True)

    df = sub.add_parser("diff", help="change data feed: I/U/D rows between two "
                                     "retained snapshots (partition-pruned)")
    df.add_argument("--manifest", required=True)
    df.add_argument("--from", dest="from_snapshot", type=int, required=True,
                    help="older snapshot id (negative = from latest)")
    df.add_argument("--to", dest="to_snapshot", type=int, default=None,
                    help="newer snapshot id (default: live manifest)")
    df.add_argument("--out", default=None,
                    help="parquet directory for the feed (default: print counts only)")

    args = ap.parse_args(argv)

    if getattr(args, "changelog", None) and not os.path.exists(args.changelog):
        print(f"error: changelog path does not exist: {args.changelog}", file=sys.stderr)
        return 2

    if args.cmd == "synth":
        from kafka_connect_s3_ray.synth import write_fixture

        fx = write_fixture(args.root, n_conv=args.conv, n_events=args.events,
                           num_partitions=args.partitions, seed=args.seed)
        print(json.dumps({"lake_dir": fx["lake_dir"], "changelog_dir": fx["changelog_dir"],
                          "events": len(fx["events"]), "lake_rows": len(fx["lake"])}))
        return 0

    if args.cmd == "metrics":
        from kafka_connect_s3_ray.state.manifest import Manifest
        from kafka_connect_s3_ray.state.metrics import engine_metrics_from_manifest

        m = Manifest.load(args.manifest)
        print(json.dumps(engine_metrics_from_manifest(m).snapshot(), indent=1))
        return 0

    if args.cmd == "snapshots":
        from kafka_connect_s3_ray.state.manifest import Manifest

        rows = []
        for sid in Manifest.snapshots(args.manifest):
            s = Manifest.load_snapshot(args.manifest, sid)
            files = [f for fs in s.current_files().values() for f in fs]
            rows.append({
                "snapshot_id": sid,
                "operation": s.metrics.get("operation"),
                "schema_fingerprint": s.schema_fingerprint,
                "partitions": len(s.partitions),
                "max_watermark": max((st.get("high_watermark", -1)
                                      for st in s.partitions.values()), default=-1),
                "files": len(files),
                "readable": all(os.path.exists(f) for f in files),
            })
        print(json.dumps({"live_snapshot_id": Manifest.load(args.manifest).snapshot_id,
                          "snapshots": rows}, indent=1))
        return 0

    if args.cmd == "lookup":
        from kafka_connect_s3_ray.pipelines.maintenance import lookup

        t = lookup(args.manifest, args.conv_id, turn_idx=args.turn,
                   snapshot=args.snapshot)
        print(json.dumps({"rows": 0 if t is None else len(t),
                          "records": [] if t is None else t.to_pylist()},
                         default=str))
        return 0

    if args.cmd == "vacuum":
        from kafka_connect_s3_ray.pipelines.maintenance import vacuum

        deleted = vacuum(args.manifest, keep_generations=args.keep,
                         dry_run=args.dry_run)
        print(json.dumps({"deleted" if not args.dry_run else "would_delete": deleted}))
        return 0

    owns_ray = _init_ray()
    import ray

    try:
        if args.cmd == "seen-build":
            import ray.data as rd

            from kafka_connect_s3_ray.functions.seen import build_seen_index

            n = build_seen_index(rd.read_parquet(args.docs), args.index,
                                 n_buckets=args.buckets,
                                 text_col=args.text_col)
            print(json.dumps({"index": args.index, "fingerprints": n,
                              "buckets": args.buckets}))
            return 0

        if args.cmd == "seen-filter":
            import ray.data as rd

            from kafka_connect_s3_ray.functions.seen import (
                filter_unseen, update_seen_index)

            batch = rd.read_parquet(args.docs)
            unseen = filter_unseen(batch, args.index, text_col=args.text_col)
            if args.out:
                unseen.write_parquet(args.out)
                # footer-metadata count of what was just written — never a
                # second read of the output data
                import pyarrow.parquet as _pq

                n_unseen = 0
                for dirpath, _, fnames in os.walk(args.out):
                    n_unseen += sum(
                        _pq.read_metadata(os.path.join(dirpath, fn)).num_rows
                        for fn in fnames if fn.endswith(".parquet"))
            else:
                n_unseen = unseen.count()
            appended = (update_seen_index(batch, args.index,
                                          text_col=args.text_col)
                        if args.update else None)
            print(json.dumps({"incoming": batch.count(), "unseen": n_unseen,
                              "out": args.out, "index_appended": appended}))
            return 0

        if args.cmd == "seen-compact":
            from kafka_connect_s3_ray.functions.seen import (
                compact_embedding_seen_index, compact_near_seen_index,
                compact_seen_index)

            res = {}
            if os.path.exists(os.path.join(args.index, "seen_meta.json")):
                res["seen_buckets"] = compact_seen_index(args.index)
            if os.path.exists(os.path.join(args.index,
                                           "near_seen_meta.json")):
                res["near_seen_buckets"] = compact_near_seen_index(args.index)
            if os.path.exists(os.path.join(args.index,
                                           "emb_seen_meta.json")):
                res["emb_clusters"] = compact_embedding_seen_index(args.index)
            if not res:
                print(f"error: no seen/near-seen meta in {args.index}",
                      file=sys.stderr)
                return 2
            print(json.dumps(res))
            return 0

        if args.cmd == "near-seen-build":
            import ray.data as rd

            from kafka_connect_s3_ray.functions.seen import \
                build_near_seen_index

            n = build_near_seen_index(rd.read_parquet(args.docs), args.index,
                                      text_col=args.text_col)
            print(json.dumps({"index": args.index, "docs": n}))
            return 0

        if args.cmd == "near-seen-filter":
            import ray.data as rd

            from kafka_connect_s3_ray.functions.seen import (
                filter_near_seen, update_near_seen_index)

            batch = rd.read_parquet(args.docs)
            surv = filter_near_seen(batch, args.index,
                                    threshold=args.threshold,
                                    text_col=args.text_col).materialize()
            if args.out:
                surv.write_parquet(args.out)
            appended = (update_near_seen_index(surv, args.index,
                                               text_col=args.text_col)
                        if args.update else None)
            print(json.dumps({"incoming": batch.count(),
                              "survivors": surv.count(), "out": args.out,
                              "index_appended": appended}))
            return 0

        if args.cmd == "compact":
            from kafka_connect_s3_ray.pipelines.upsert import compact_partitions

            m = compact_partitions(args.manifest, args.out)
            print(json.dumps({"delta_counts": {str(k): v for k, v in
                                               m.delta_counts().items()}}))
            return 0
        if args.cmd == "emb-seen-build":
            import ray.data as rd

            from kafka_connect_s3_ray.functions.seen import \
                build_embedding_seen_index

            n = build_embedding_seen_index(
                rd.read_parquet(args.vecs), args.index,
                n_clusters=args.clusters, id_col=args.id_col,
                vec_col=args.vec_col)
            print(json.dumps({"index": args.index, "vectors": n,
                              "clusters": args.clusters}))
            return 0

        if args.cmd == "emb-seen-filter":
            import ray.data as rd

            from kafka_connect_s3_ray.functions.seen import (
                filter_embedding_seen, update_embedding_seen_index)

            batch = rd.read_parquet(args.vecs)
            surv = filter_embedding_seen(batch, args.index,
                                         threshold=args.threshold,
                                         nprobe=args.nprobe).materialize()
            if args.out:
                surv.write_parquet(args.out)
            appended = (update_embedding_seen_index(surv, args.index)
                        if args.update else None)
            print(json.dumps({"incoming": batch.count(),
                              "survivors": surv.count(), "out": args.out,
                              "index_appended": appended}))
            return 0

        if args.cmd == "repartition":
            from kafka_connect_s3_ray.pipelines.maintenance import \
                repartition_lake

            report = repartition_lake(args.manifest, args.out_lake,
                                      new_partitions=args.partitions)
            print(json.dumps(report))
            return 0
        if args.cmd == "view-refresh":
            from kafka_connect_s3_ray.pipelines.views import (
                build_view,
                refresh_view,
            )

            fn = build_view if args.rebuild else refresh_view
            meta = fn(args.manifest, args.view_dir)
            print(json.dumps({
                "view": meta["view"],
                "rows": meta["rows"],
                "partitions": len(meta["partitions"]),
                "refreshed": meta["refreshed"],
                "carried": meta["carried"],
            }))
            return 0
        if args.cmd == "stats":
            from kafka_connect_s3_ray.pipelines.maintenance import \
                conversation_stats_table
            from kafka_connect_s3_ray.pipelines.upsert import read_lake

            t = conversation_stats_table(
                read_lake(args.manifest, snapshot=args.snapshot))
            if args.out:
                import pyarrow.parquet as _pq

                _pq.write_table(t, args.out, compression="zstd")
            turns = t.column("turns").to_numpy(zero_copy_only=False)
            print(json.dumps({
                "conversations": len(t),
                "turns": int(turns.sum()),
                "assistant_turns": int(t.column("assistant_turns")
                                       .to_numpy(zero_copy_only=False).sum()),
                "tool_turns": int(t.column("tool_turns")
                                  .to_numpy(zero_copy_only=False).sum()),
                "tokens_ws": int(t.column("tokens_ws")
                                 .to_numpy(zero_copy_only=False).sum()),
                "max_turns": int(turns.max()) if len(t) else 0,
                "out": args.out, "snapshot": args.snapshot}))
            return 0
        if args.cmd == "query":
            from kafka_connect_s3_ray.pipelines.queries import QUERIES

            if args.list or not args.name:
                print(json.dumps({"queries": sorted(QUERIES)}))
                return 0
            if args.name not in QUERIES:
                print(json.dumps({"error": f"unknown query {args.name!r}; "
                                           f"--list shows the catalog"}))
                return 2
            if not args.sf:
                print(json.dumps({"error": "--sf <table directory> is "
                                           "required to run a query"}))
                return 2
            import pandas as _pd
            import pyarrow as pa

            import ray.data

            def _jsafe(v):
                # bare NaN/Infinity are not valid JSON (the profile verb's
                # _num contract, applied to arbitrary preview values)
                if isinstance(v, float) and (v != v or v in
                                             (float("inf"), float("-inf"))):
                    return None
                return v

            res = QUERIES[args.name](args.sf)
            if isinstance(res, ray.data.Dataset) and not args.out:
                # ONE streaming pass: count rows while keeping only the
                # first --limit for the preview. Never materializes the
                # result (this surface exists for results bigger than the
                # object store) and never runs the lazy plan twice.
                limit = max(0, args.limit)
                n_rows, head, cols = 0, [], []
                for b in res.iter_batches(batch_format="pyarrow"):
                    n_rows += len(b)
                    cols = cols or b.column_names
                    if len(head) < limit:
                        head.extend(
                            b.slice(0, limit - len(head)).to_pylist())
                if not cols:  # empty result: names from the (now known) plan
                    cols = res.schema().names
            else:
                if isinstance(res, ray.data.Dataset):
                    tbl = pa.Table.from_pandas(res.to_pandas(),
                                               preserve_index=False)
                elif isinstance(res, _pd.DataFrame):
                    tbl = pa.Table.from_pandas(res, preserve_index=False)
                else:
                    tbl = res
                if args.out:
                    import pyarrow.parquet as _pq

                    _pq.write_table(tbl, args.out, compression="zstd")
                n_rows, cols = len(tbl), tbl.column_names
                head = tbl.slice(0, max(0, args.limit)).to_pylist()
            head = [{k: _jsafe(v) for k, v in row.items()} for row in head]
            print(json.dumps({"name": args.name, "rows": n_rows,
                              "columns": cols,
                              "preview": head, "out": args.out},
                             default=str))
            return 0
        if args.cmd == "profile":
            import pyarrow as pa

            from kafka_connect_s3_ray.functions.profile import column_profile
            from kafka_connect_s3_ray.pipelines.upsert import read_lake

            lake = read_lake(args.manifest, snapshot=args.snapshot)
            cols = lake.schema().names
            numeric = {c for c, t in zip(cols, lake.schema().types)
                       if pa.types.is_integer(t) or pa.types.is_floating(t)}
            t = column_profile(lake, cols, numeric=numeric)
            if args.out:
                import pyarrow.parquet as _pq

                _pq.write_table(t, args.out, compression="zstd")
            def _num(x):
                # NaN is not valid JSON; a non-numeric column's min/max is
                # semantically "none", so serialize it that way
                return None if x is None or x != x else x

            print(json.dumps({
                "columns": {
                    r["col"]: {"n_rows": r["n_rows"],
                               "n_nulls": r["n_nulls"],
                               "n_distinct": r["n_distinct"],
                               "min_num": _num(r["min_num"]),
                               "max_num": _num(r["max_num"])}
                    for r in t.to_pylist()},
                "out": args.out, "snapshot": args.snapshot}))
            return 0
        if args.cmd == "validate":
            from kafka_connect_s3_ray.pipelines.maintenance import validate_lake

            print(json.dumps(validate_lake(args.manifest)))
            return 0
        if args.cmd in ("export", "export-pairs"):
            from kafka_connect_s3_ray.pipelines.upsert import read_lake

            fmt = getattr(args, "format", "parquet")
            suffix = ".parquet" if fmt == "parquet" else ".json"

            def _out_files(d, suffix=suffix):
                out = set()
                if os.path.isdir(d):
                    for dirpath, _, fnames in os.walk(d):
                        out.update(os.path.join(dirpath, fn) for fn in fnames
                                   if fn.endswith((".parquet", ".json")))
                return {f for f in out if f.endswith(suffix)} or out

            if _out_files(args.out):
                # a reused directory would hold the UNION of every export
                # (the writers append uniquely-named files) while any
                # count describes only one run — refuse instead of
                # producing a directory whose content nobody asked for
                print(f"error: --out {args.out} already contains export "
                      "files; export to a fresh directory", file=sys.stderr)
                return 2
            ds = read_lake(args.manifest, snapshot=args.snapshot)
            if args.cmd == "export-pairs":
                from kafka_connect_s3_ray.pipelines.maintenance import (
                    turn_pairs_dataset,
                )

                ds = turn_pairs_dataset(ds)
            # one execution either way: ds.count() would re-run the whole
            # read (incl. merge-on-read delta resolution). Parquet counts
            # come from footers (O(files)); JSONL has no metadata, so its
            # count is one line scan of the just-written (page-cache-warm)
            # local files — O(bytes), the honest price of the format.
            if fmt == "jsonl":
                # ISO microsecond timestamps: pandas to_json defaults to
                # epoch-MILLISECONDS, silently truncating lake event times
                # and diverging from the parquet export of the same verb
                ds.write_json(args.out, date_format="iso", date_unit="us")
                rows = 0
                for f in _out_files(args.out):
                    with open(f, "rb") as fh:
                        rows += sum(1 for _ in fh)
            else:
                ds.write_parquet(args.out)
                import pyarrow.parquet as _pq

                rows = sum(_pq.read_metadata(f).num_rows
                           for f in _out_files(args.out))
            print(json.dumps({"out": args.out, "rows": rows,
                              "format": fmt, "snapshot": args.snapshot}))
            return 0
        if args.cmd == "diff":
            from kafka_connect_s3_ray.pipelines.upsert import snapshot_diff

            ds = snapshot_diff(args.manifest, from_snapshot=args.from_snapshot,
                               to_snapshot=args.to_snapshot)
            ops = {"I": 0, "U": 0, "D": 0}
            if args.out:
                # one execution: write the feed, then count from the (small,
                # column-pruned) written files instead of re-running the diff
                ds.write_parquet(args.out)
                if os.path.isdir(args.out):  # empty feed writes no files
                    import pyarrow.compute as pc
                    import pyarrow.dataset as pads

                    t = pads.dataset(args.out).to_table(columns=["change_op"])
                    for s in pc.value_counts(t.column("change_op")).to_pylist():
                        ops[s["values"]] = int(s["counts"])
            else:
                for b in ds.iter_batches(batch_format="pandas", batch_size=65536):
                    ops.update({k: ops[k] + int(v) for k, v in
                                b["change_op"].value_counts().items()})
            print(json.dumps({"from": args.from_snapshot, "to": args.to_snapshot,
                              "out": args.out, "changes": ops,
                              "total": sum(ops.values())}))
            return 0
        if args.cmd == "chunk":
            import ray.data

            from kafka_connect_s3_ray.functions.text import chunk_documents

            if os.path.isdir(args.out) and os.listdir(args.out):
                print(f"error: --out {args.out} is not empty; chunk to a "
                      "fresh directory", file=sys.stderr)
                return 2
            ds = chunk_documents(
                ray.data.read_parquet(args.docs),
                size=args.size, stride=args.stride,
                text_col=args.text_col, id_col=args.id_col)
            if args.format == "jsonl":
                ds.write_json(args.out, date_format="iso", date_unit="us")
            else:
                ds.write_parquet(args.out)
            print(json.dumps({"out": args.out, "format": args.format,
                              "size": args.size, "stride": args.stride}))
            return 0
        if args.cmd == "pack":
            import shutil

            import numpy as np
            import pyarrow as pa
            import pyarrow.parquet as pq
            import ray.data

            from kafka_connect_s3_ray.functions.packing import pack_sequences

            # TRUE resume: `shard=N` dirs already present in --out are
            # skipped (the assignment is deterministic, so a finished shard
            # is byte-equivalent on any rerun); new shards land in a sibling
            # tmp dir and move into --out per shard, so a crash never leaves
            # a partial shard dir where the next run would trust it
            tmp = args.out.rstrip("/") + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            done = set()
            if os.path.isdir(args.out):
                done = {int(d.split("=", 1)[1]) for d in os.listdir(args.out)
                        if d.startswith("shard=")}
            cols = [args.id_col, args.text_col] + (
                [args.group_col] if args.group_col else [])
            ds = ray.data.read_parquet(args.docs, columns=cols)
            out = pack_sequences(ds, budget=args.budget,
                                 part_size=args.part_size,
                                 id_col=args.id_col, text_col=args.text_col,
                                 group_col=args.group_col)
            psz = args.part_size
            skip = np.array(sorted(done), np.int64)

            def add_shard(t: pa.Table, _id=args.id_col) -> pa.Table:
                ids = t.column(_id).to_numpy(zero_copy_only=False)
                shard = ids // psz
                t = t.append_column("shard", pa.array(shard, pa.int64()))
                if len(skip):
                    t = t.filter(pa.array(~np.isin(shard, skip)))
                return t

            out.map_batches(add_shard, batch_format="pyarrow").write_parquet(
                tmp, partition_cols=["shard"])
            os.makedirs(args.out, exist_ok=True)
            written = 0
            if os.path.isdir(tmp):
                for d in sorted(os.listdir(tmp)):
                    if d.startswith("shard="):
                        os.rename(os.path.join(tmp, d),
                                  os.path.join(args.out, d))
                        written += 1
            shutil.rmtree(tmp, ignore_errors=True)
            # footer-metadata count only — never a data readback
            rows = 0
            for dirpath, _, fnames in os.walk(args.out):
                rows += sum(pq.read_metadata(os.path.join(dirpath, f)).num_rows
                            for f in fnames if f.endswith(".parquet"))
            print(json.dumps({"out": args.out, "rows": rows,
                              "shards_written": written,
                              "shards_skipped": len(done),
                              "budget": args.budget}))
            return 0
        if args.cmd == "upsert":
            from kafka_connect_s3_ray.pipelines.upsert import run_upsert
            from kafka_connect_s3_ray.state.metrics import engine_metrics_from_manifest

            hot = args.hot_keys
            if hot and hot != "auto":
                hot = set(hot.split(","))
            t0 = time.perf_counter()
            m = run_upsert(args.changelog, args.out, args.manifest,
                           lake_dir=args.lake, num_partitions=args.partitions,
                           hot_keys=hot, n_salts=args.salts, mode=args.mode,
                           commit_mode=args.commit_mode)
            wall = time.perf_counter() - t0
            print(json.dumps(engine_metrics_from_manifest(m, wall_seconds=wall).snapshot()))
            return 0
        if args.cmd == "tail":
            from kafka_connect_s3_ray.pipelines.tail import tail_changelog

            m = tail_changelog(args.changelog, args.out, args.manifest,
                               lake_dir=args.lake, num_partitions=args.partitions,
                               poll_interval_s=args.poll_interval,
                               max_rounds=args.rounds,
                               commit_mode=args.commit_mode,
                               compact_every=args.compact_every,
                               flush_interval_rounds=args.flush_interval_rounds,
                               grace_rounds=args.grace_rounds,
                               flush_interval_ms=args.flush_interval_ms,
                               grace_ms=args.grace_ms)
            print(json.dumps({"watermarks": {str(p): m.watermark(p)
                                             for p in sorted(m.partitions)}}))
            return 0
    finally:
        if owns_ray:
            ray.shutdown()
    return 1


if __name__ == "__main__":
    sys.exit(main())
