"""Pipeline runner — the Control Flow analog (SURVEY.md §2.11, §3.1).

Reference parity:
  - SSIS Control Flow precedence constraints (Success/Failure/Completion
    + expressions, PRO/Глава 17:25-40) -> stage dependency DAG with
    ``run_on`` conditions.
  - retries / idempotent tasks (AF/001 Intro.md:70, AF/002 Plan.md:94-98)
    -> per-stage ``retries``.
  - per-component timing (PRACT/007 Vizualizer.md) -> stage metrics dict.
  - checkpoint/restart: only PHASE boundaries are resumable, never
    intra-flow progress (PRACT/004 CDC.md:552-555) -> ``resume_from`` +
    ``checkpointed_write`` (atomic temp-dir swap).
  - multicast persistence (PRO/Глава 07:76-80) -> ``persist_on_fanout``.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Stage:
    name: str
    fn: Callable[["Context"], object]
    depends_on: Sequence[str] = ()
    retries: int = 0
    run_on: str = "success"           # success | failure | completion


@dataclass
class Context:
    """Pipeline variables (the SSIS ``Dts.Variables`` analog)."""
    spark: SparkSession
    params: dict = field(default_factory=dict)
    results: dict = field(default_factory=dict)
    metrics: dict = field(default_factory=dict)

    def __getitem__(self, k):
        return self.results[k] if k in self.results else self.params[k]

    def __setitem__(self, k, v):
        self.results[k] = v


class Pipeline:
    def __init__(self, name: str):
        self.name = name
        self.stages: list[Stage] = []

    def stage(self, name: str, depends_on: Sequence[str] = (),
              retries: int = 0, run_on: str = "success"):
        """Decorator registering a stage function ``fn(ctx) -> result``."""
        def deco(fn):
            self.stages.append(Stage(name, fn, depends_on, retries, run_on))
            return fn
        return deco

    def _ordered(self) -> list[Stage]:
        """Stable topological order: every stage runs after its
        dependencies regardless of declaration order (a failure
        handler declared BEFORE the stage it handles would otherwise
        be visited too early, silently never running while still
        suppressing the error).  Declaration order is preserved among
        stages whose dependencies are satisfied."""
        by_name = {s.name: s for s in self.stages}
        done: set[str] = set()
        out: list[Stage] = []
        pending = list(self.stages)
        while pending:
            progressed = False
            for s in list(pending):
                if all(d in done for d in s.depends_on if d in by_name):
                    out.append(s)
                    done.add(s.name)
                    pending.remove(s)
                    progressed = True
            if not progressed:
                cycle = [s.name for s in pending]
                raise ValueError(f"dependency cycle among stages: {cycle}")
        return out

    def run(self, spark: SparkSession, params: dict | None = None,
            resume_from: str | None = None) -> Context:
        """Execute stages in declared order honoring dependencies.

        ``resume_from`` skips stages before the named one (phase-level
        restart — the only resumability the reference endorses; skipped
        stages must be idempotent producers whose outputs the resumed
        stages re-read from storage).
        """
        names = [s.name for s in self.stages]
        if resume_from is not None and resume_from not in names:
            raise ValueError(f"resume_from {resume_from!r} matches no "
                             f"stage; stages: {names}")
        unknown = {d for s in self.stages for d in s.depends_on
                   if d not in names}
        if unknown:
            raise ValueError(f"depends_on references unknown stages: "
                             f"{sorted(unknown)}")
        ctx = Context(spark, dict(params or {}))
        status: dict[str, str] = {}
        skipping = resume_from is not None
        for st in self._ordered():
            if skipping:
                if st.name == resume_from:
                    skipping = False
                else:
                    status[st.name] = "skipped"
                    continue
            dep_states = [status.get(d, "missing") for d in st.depends_on]
            ok_deps = all(s in ("ok", "skipped") for s in dep_states)
            failed_deps = any(s == "failed" for s in dep_states)
            should_run = (
                (st.run_on == "success" and ok_deps) or
                (st.run_on == "failure" and failed_deps) or
                (st.run_on == "completion" and
                 all(s != "missing" for s in dep_states)))
            if st.depends_on and not should_run:
                status[st.name] = "not_run"
                continue
            t0 = time.monotonic()
            attempt, err = 0, None
            while attempt <= st.retries:
                try:
                    ctx.results[st.name] = st.fn(ctx)
                    status[st.name] = "ok"
                    err = None
                    break
                except Exception as e:      # noqa: BLE001 — retry boundary
                    err = e
                    attempt += 1
            ctx.metrics[st.name] = {"seconds": time.monotonic() - t0,
                                    "attempts": attempt + (err is None),
                                    "status": status.get(st.name, "failed")}
            if err is not None:
                status[st.name] = "failed"
                ctx.metrics[st.name]["status"] = "failed"
                if not any(s.run_on == "failure" and st.name in s.depends_on
                           for s in self.stages):
                    raise err
        ctx.metrics["__status"] = status
        return ctx


def from_spec(spec: Mapping) -> Pipeline:
    """Build a pipeline from a declarative spec (the DTExec / external
    drive surface, PRO/Глава 20:24-33; Глава 21:8-16): packages are data
    loaded and parametrized programmatically.  Spec shape:

        {"name": "p", "stages": [
            {"name": "load",  "read": {"format": "parquet", "path": "..."}},
            {"name": "tax",   "component": "add_tax", "params": {"rate": 0.2},
             "input": "load", "depends_on": ["load"]},
            {"name": "sql",   "sql": "SELECT ... FROM {load}"},
            {"name": "out",   "write": {"path": "...", "format": "parquet"},
             "input": "tax", "depends_on": ["tax"]}]}

    Stage kinds: ``read`` (DataFrameReader options), ``component``
    (registered PipelineComponent by name), ``sql`` (text with
    ``{stage}`` placeholders resolved to temp views), ``write``
    (atomic checkpointed publish).  JSON/YAML-parsed dicts both work —
    the spec is plain data, editable without touching engine code.
    """
    import re as _re

    from bi_etl_and_integration_spark.operators.plugin import component

    p = Pipeline(spec.get("name", "pipeline"))
    for st in spec["stages"]:
        name = st["name"]
        depends = tuple(st.get("depends_on", ()))

        if "read" in st:
            def fn(ctx, _c=dict(st["read"])):
                c = dict(_c)
                fmt, path = c.pop("format", "parquet"), c.pop("path")
                r = ctx.spark.read.format(fmt)
                for k, v in c.items():
                    r = r.option(k, v)
                return r.load(path)
        elif "component" in st:
            def fn(ctx, _n=st["component"], _p=dict(st.get("params", {})),
                   _in=st["input"]):
                return component(_n, **_p)(ctx[_in])
        elif "sql" in st:
            def fn(ctx, _q=st["sql"]):
                def view(m):
                    stage = m.group(1)
                    vname = f"__stage_{stage}"
                    ctx[stage].createOrReplaceTempView(vname)
                    return vname
                return ctx.spark.sql(_re.sub(r"\{(\w+)\}", view, _q))
        elif "write" in st:
            def fn(ctx, _c=dict(st["write"]), _in=st["input"]):
                return checkpointed_write(ctx[_in], _c["path"],
                                          fmt=_c.get("format", "parquet"))
        else:
            raise ValueError(f"stage {name!r}: no read/component/sql/write")
        p.stage(name, depends_on=depends,
                retries=int(st.get("retries", 0)),
                run_on=st.get("run_on", "success"))(fn)
    return p


def persist_on_fanout(df: DataFrame, consumers: int) -> DataFrame:
    """Persist a DataFrame consumed by >1 downstream stage (Cache
    Connection Manager reuse, PRO/Глава 07:76-80)."""
    return df.persist() if consumers > 1 else df


def recover_publish(path: str) -> bool:
    """Heal a crash inside ``checkpointed_write``'s swap window: if the
    published path is missing but a ``__old_`` backup exists, restore
    the newest backup.  Returns True if a restore happened.  Called
    automatically by ``checkpointed_write``; readers that must survive
    a concurrent publisher crash can call it before reading."""
    if os.path.exists(path):
        return False
    import glob
    # glob.escape: a publish path containing [ ? * must match itself
    # literally or the backup is never found and the heal silently noops
    backups = sorted(glob.glob(glob.escape(path) + "__old_*"),
                     key=os.path.getmtime)
    if not backups:
        return False
    os.replace(backups[-1], path)
    return True


def checkpointed_write(df: DataFrame, path: str, *,
                       fmt: str = "parquet") -> str:
    """Crash-safe publish: write to a temp dir, then swap into place
    (single-writer assumption — documented; a lakehouse format replaces
    this on shared storage).  A partial write is never visible.  POSIX
    has no atomic DIRECTORY swap, so between the two renames there is a
    sub-millisecond window where ``path`` is absent; a crash inside
    that window is healed by :func:`recover_publish` (run automatically
    on the next publish), and the ``__old_`` backup is only deleted
    after the new version is in place."""
    recover_publish(path)
    tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
    getattr(df.write.mode("overwrite"), fmt)(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.replace(path, old)
    os.replace(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return path
