"""CLI entry (the reference's C4: argv[1] = config path, default
config fallback, wires everything — src/main.rs:27-60).

    python -m kafka_delta_rs_ray.run my_job.yaml

Owns the Ray session (guarded init) — library code never does.
"""

from __future__ import annotations

import json
import logging
import sys

from .config import MaintenanceConfig
from .errors import ConfigError


def init_logging(level: str = "INFO") -> None:
    """C3 analog (src/logging/mod.rs:6-10)."""
    logging.basicConfig(
        level=getattr(logging, level.upper(), logging.INFO),
        format="%(asctime)s %(levelname)s %(name)s %(message)s")


def run(cfg: MaintenanceConfig) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from .pipelines import cluster as cl
    from .pipelines import compact as cp
    from .pipelines import expire as ex
    from .pipelines import lifecycle as lc
    from .pipelines import merge as mg
    from .tablefmt import Table

    if cfg.job == "lifecycle":
        out = lc.maintenance_lifecycle()
        return {"job": "lifecycle", "stages": out.to_pylist()}

    from .pipelines import delete as dl

    table = Table(cfg.table_root)
    if cfg.job == "branch":
        # branch management: options.action = create|merge|delete|list
        # (write-audit-publish: run maintenance jobs with
        # options.branch=<name>, audit the branch snapshot, then
        # action=merge to fast-forward main)
        action = cfg.options.get("action", "list")
        name = cfg.options.get("name")
        if action == "list":
            return {"job": "branch", "branches": table.branches()}
        if not name:
            raise ValueError("branch job needs options.name")
        if action == "create":
            bv = cfg.options.get("from_version")
            table.create_branch(name, None if bv is None else int(bv))
            return {"job": "branch", "created": name,
                    "versions": table.branch(name).versions()}
        if action == "merge":
            m = table.merge_branch(name)
            return {"job": "branch", "merged": name,
                    "version": None if m is None else m.version}
        if action == "delete":
            table.delete_branch(name)
            return {"job": "branch", "deleted": name}
        raise ValueError(f"unknown branch action {action!r}")
    if cfg.options.get("branch"):
        # any maintenance job can target a branch line (write-audit-
        # publish): identical engine path, isolated commits
        table = table.branch(str(cfg.options["branch"]))
    if cfg.job == "alter":
        # schema/contract evolution: options.action =
        # add_constraint | drop_constraint | drop_column
        action = cfg.options.get("action")
        if action == "add_constraint":
            m = table.add_constraint(cfg.options["constraint"])
            return {"job": "alter", "added": cfg.options["constraint"]
                    ["name"], "version": m.version}
        if action == "drop_constraint":
            m = table.drop_constraint(cfg.options["name"])
            return {"job": "alter", "dropped_constraint":
                    cfg.options["name"], "version": m.version}
        if action == "drop_column":
            m = table.drop_column(cfg.options["name"])
            return {"job": "alter", "dropped_column":
                    cfg.options["name"], "version": m.version}
        raise ValueError(f"unknown alter action {action!r}")
    if cfg.job == "history":
        return {"job": "history", "history": table.history()}
    if cfg.job == "metrics":
        from .state.monitoring import aggregate_metrics, follow_events

        mon = cfg.monitoring
        if mon.get("enabled") is False:  # reference no-op handle
            return {"job": "metrics", "enabled": False}
        if cfg.options.get("follow"):
            # live collector mode: tail <table>/_events.jsonl and print
            # each event as it lands (the in-run push surface; ends
            # after options.idle_timeout seconds of quiet, default 30)
            n = 0
            for ev in follow_events(
                    table.root,
                    idle_timeout=float(cfg.options.get("idle_timeout",
                                                       30.0))):
                print(json.dumps(ev), flush=True)
                n += 1
            return {"job": "metrics", "enabled": True, "followed": True,
                    "events": n}
        if mon.get("export_path"):
            # periodic-export mode (reference PeriodicReader +
            # exporter, src/monitoring/mod.rs:49-75): snapshots land
            # on export_path until options.export_for seconds elapse
            # (default: one immediate flush via shutdown)
            from .state.monitoring import reader_from_config

            # reaching here means not explicitly disabled — the job
            # invocation itself is the enable switch
            reader = reader_from_config(table.root,
                                        {**mon, "enabled": True})
            if cfg.options.get("export_for"):
                import time as _time

                _time.sleep(float(cfg.options["export_for"]))
            reader.shutdown()
            return {"job": "metrics", "enabled": True,
                    "exported_to": mon["export_path"]}
        return {"job": "metrics", "enabled": True,
                **aggregate_metrics(
                    table.root,
                    last_n_runs=mon.get("last_n_runs"),
                    service_name=mon.get("service_name",
                                         "kafka-delta-rs-ray"))}
    if cfg.job == "autopilot":
        # closed maintenance policy loop: metadata signals → thresholded
        # decisions → actions (the at-rest analog of the reference's
        # flush-policy loop, src/kafka/mod.rs:182-190)
        from .pipelines.autopilot import autopilot

        opts = cfg.options
        kw = {k: opts[k] for k in ("max_delete_debt",
                                   "max_point_selectivity",
                                   "min_cluster_fragments",
                                   "min_age_seconds") if k in opts}
        return {"job": "autopilot",
                **autopilot(table, keep_last=cfg.keep_last,
                            target_fragment_bytes=cfg.target_fragment_bytes,
                            dry_run=bool(opts.get("dry_run")), **kw)}
    if cfg.job == "stats":
        from .state.tablestats import table_stats

        return {"job": "stats",
                **table_stats(table,
                              columns=cfg.options.get("stats_columns"))}
    if cfg.job == "export":
        # consumer hand-off: snapshot → plain partitioned parquet
        # shards, resumable per fragment (pipelines/export.py)
        from .pipelines.export import export_shards

        out_dir = cfg.options.get("output_path")
        if not out_dir:
            raise ConfigError("export requires options.output_path")
        rep = export_shards(table, out_dir,
                            columns=cfg.options.get("columns"),
                            version=cfg.options.get("version"),
                            run_id=cfg.run_id,
                            overwrite=bool(cfg.options.get("overwrite",
                                                           False)))
        return {"job": "export", "output_path": out_dir,
                "rows": rep["rows"], "shards": len(rep["shards"]),
                "resumed_shards": rep.get("resumed_shards", 0),
                "source_version": rep["source_version"]}
    if cfg.job == "changes":
        # CDC consumer surface: the (from, to] change feed written as
        # partitioned parquet for downstream re-consumers (the table-
        # format analog of the reference's Kafka feed)
        from .pipelines.cdc import table_changes

        opts = cfg.options
        if "from_version" not in opts or "output_path" not in opts:
            raise ValueError(
                "changes requires options.from_version and "
                "options.output_path (options.to_version defaults to "
                "latest)")
        import glob as _glob
        import os as _os

        import pyarrow.parquet as _pq

        # resolve the span BEFORE planning so the report and the feed
        # agree even if another writer commits mid-job; a stale output
        # dir would double-count rows AND feed consumers duplicates
        to_v = (int(opts["to_version"]) if opts.get("to_version")
                is not None else table.latest_version())
        out_dir = opts["output_path"]
        if _os.path.isdir(out_dir) and _os.listdir(out_dir):
            raise ValueError(
                f"changes: output_path {out_dir!r} is not empty — "
                f"each feed run needs its own directory")
        feed = table_changes(table, int(opts["from_version"]), to_v)
        feed.write_parquet(out_dir)
        # row count from the written files' metadata — the feed
        # itself streams exactly once
        n = sum(_pq.read_metadata(p).num_rows for p in
                _glob.glob(f"{out_dir}/*.parquet"))
        return {"job": "changes", "rows": int(n),
                "from_version": int(opts["from_version"]),
                "to_version": to_v,
                "output_path": out_dir}
    if cfg.job == "quarantine":
        from .stages.validate import quarantine_report

        return {"job": "quarantine",
                **quarantine_report(table.root, run_id=cfg.run_id)}
    if cfg.job == "compact":
        m = cp.compact(table, cfg.target_fragment_bytes, run_id=cfg.run_id,
                       transcode_fmt=cfg.transcode_fmt)
    elif cfg.job == "delete":
        pred = {k: (v[0], v[1]) for k, v in cfg.predicate.items()}
        m = dl.delete_where(table, pred, run_id=cfg.run_id)
    elif cfg.job == "update":
        from .pipelines.update import update_where

        pred = {k: (v[0], v[1]) for k, v in cfg.predicate.items()}
        m = update_where(table, pred, cfg.options["assignments"],
                         run_id=cfg.run_id)
    elif cfg.job == "clone":
        c = table.clone(cfg.options["dest_root"],
                        version=cfg.options.get("clone_version"))
        return {"job": "clone", "dest_root": c.root,
                "rows": int(c.read_manifest().total_rows())}
    elif cfg.job == "rollback":
        m = dl.rollback(table, cfg.restore_version)
    elif cfg.job == "cluster":
        m = cl.cluster(table, cfg.target_fragment_rows,
                       salt_buckets=cfg.salt_buckets, run_id=cfg.run_id,
                       curve=cfg.cluster_curve,
                       key_cols=cfg.options.get("cluster_key_cols"),
                       salt_col=cfg.options.get("cluster_salt_col",
                                                "image_id"),
                       incremental=bool(cfg.options.get("incremental",
                                                        False)))
    elif cfg.job == "expire":
        rep = ex.expire(table, keep_last=cfg.keep_last,
                        min_age_seconds=cfg.min_age_seconds,
                        run_id=cfg.run_id)
        return {"job": "expire", **{k: v for k, v in rep.items()
                                    if k != "removed_files"},
                "removed": len(rep["removed_files"])}
    elif cfg.job == "append":
        import ray.data as rd

        from .pipelines import ingest as ig

        src = rd.read_parquet(cfg.changeset_path)
        m = ig.append(table, src, run_id=cfg.run_id,
                      target_fragment_rows=cfg.target_fragment_rows,
                      mode=cfg.options.get("write_mode", "default"))
    elif cfg.job == "stream":
        # the reference's main runtime: consume a stream of micro-
        # batches under the size/time flush policy (src/main.rs:27-60
        # wires config -> consumer loop). Each parquet file matched by
        # the changeset_path glob is one micro-batch, consumed in
        # filename order (a file-drop directory is the sandbox's
        # stand-in for a topic partition feed).
        import glob as _glob

        import pyarrow.parquet as _pq

        from .pipelines.stream import stream_ingest

        files = sorted(_glob.glob(cfg.changeset_path))
        if not files:
            raise ValueError(
                f"stream: no files match {cfg.changeset_path!r}")
        parse_errors = 0

        def _micro_batches():
            nonlocal parse_errors
            if cfg.message_format == "parquet":
                for p in files:
                    yield _pq.read_table(p)
                return
            # JSON-lines / Arrow-IPC feed: schema-projected parse per
            # file; parse failures dead-letter to quarantine/ (the
            # reference's P1 parse → P4 dead-letter routing) and never
            # poison the merge
            from .sources.readers import parse_arrow_ipc, parse_json_lines
            from .stages.validate import write_quarantine_table

            parse = (parse_arrow_ipc if cfg.message_format == "arrow-ipc"
                     else parse_json_lines)
            for p in files:
                with open(p, "rb") as f:
                    rows, errs = parse(f.read())
                if errs.num_rows:
                    parse_errors += errs.num_rows
                    q = errs.append_column(
                        "source_file", [[p] * errs.num_rows])
                    # hardened dead-letter writer: retry w/ backoff,
                    # log-and-continue on final failure
                    write_quarantine_table(
                        table.root, cfg.run_id or "stream-parse", q)
                yield rows

        stats = stream_ingest(
            table, _micro_batches(), app_id=cfg.app_id,
            max_buffer_rows=cfg.max_buffer_rows,
            max_wait_secs=cfg.max_wait_secs,
            max_buffer_bytes=cfg.max_buffer_bytes, run_id=cfg.run_id,
            merge_kwargs={"target_fragment_rows": cfg.target_fragment_rows})
        return {"job": "stream", "files": len(files),
                "parse_errors": parse_errors,
                **{k: (len(v) if isinstance(v, list) else v)
                   for k, v in stats.items()}}
    elif cfg.job == "merge":
        import ray.data as rd

        ch = rd.read_parquet(cfg.changeset_path)
        m = mg.merge(table, ch, app_id=cfg.app_id,
                     n_buckets=cfg.merge_buckets, run_id=cfg.run_id,
                     target_fragment_rows=cfg.target_fragment_rows)
    else:
        raise ValueError(cfg.job)
    return {"job": cfg.job,
            "committed_version": None if m is None else m.version}


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    path = argv[0] if argv else "maintenance.yaml"
    init_logging()
    cfg = MaintenanceConfig.load(path)
    print(json.dumps(run(cfg)))
    import ray

    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
