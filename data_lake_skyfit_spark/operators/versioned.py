"""Versioned parquet table: manifest-committed writes, time travel,
and snapshot diffs — a minimal Delta-style transaction log over plain
parquet.

The reference's upsert loop (src/common/db.py:120-227 ON CONFLICT)
destroys prior state on every run: no "what did this table look like
before today's extraction?", no auditable change feed, and readers can
observe a half-committed TRUNCATE+INSERT. The lakehouse answer is an
immutable-data + manifest-pointer design:

- every commit writes data files into a fresh generation directory and
  records a manifest (partition → generation mapping) as `_manifests/
  v<N>.json`; a `_LATEST` pointer file is swapped last via atomic
  rename. Readers resolve a manifest and only ever see fully committed
  states — there is no window where a reader observes a partial write.
- merges are copy-on-write at partition granularity: only the
  generations of source-touched partitions are rewritten; untouched
  partitions keep pointing at their existing generation directories.
  At 100 TB a daily merge commits kilobytes of manifest plus the
  touched partitions' files — the same write volume as
  ParquetTable's partition-scoped swap, but old versions stay
  readable.
- `read(version=N)` is time travel; `diff(v0, v1)` composes with
  operators.history.snapshot_diff into an exact CDC feed between any
  two commits; `vacuum(retain_last=K)` drops manifests older than the
  retention window and deletes generation dirs no kept manifest
  references.

Single-writer, like the reference's scheduled pipeline (and like the
non-versioned ParquetTable): commits are not designed for concurrent
writers racing on `_LATEST`.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Sequence
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame, SparkSession

from .dedupe import latest_wins
from .merge import MergeMode, align_schemas, leaf_dirs, merge_rows, partition_scope

__all__ = ["VersionedParquetTable"]

_ROOT = "__root__"  # manifest key for an unpartitioned table's data


@dataclass
class VersionedParquetTable:
    path: str
    key: Sequence[str]
    partition_by: Sequence[str] = field(default_factory=tuple)

    # -- log layout ---------------------------------------------------------

    @property
    def _manifest_dir(self) -> str:
        return os.path.join(self.path, "_manifests")

    @property
    def _data_dir(self) -> str:
        return os.path.join(self.path, "_data")

    def _gen_dir(self, gen: str) -> str:
        return os.path.join(self._data_dir, gen)

    def versions(self) -> list[int]:
        if not os.path.isdir(self._manifest_dir):
            return []
        return sorted(
            int(n[1:-5])
            for n in os.listdir(self._manifest_dir)
            if n.startswith("v") and n.endswith(".json")
        )

    def latest_version(self) -> int | None:
        """The committed version per the _LATEST pointer (falls back to
        the highest manifest if the pointer write crashed mid-commit —
        both states are fully written, the pointer is just behind)."""
        p = os.path.join(self.path, "_LATEST")
        if os.path.exists(p):
            with open(p) as f:
                return int(f.read().strip())
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self._manifest_dir, f"v{version:08d}.json")) as f:
            return json.load(f)

    def _commit(self, mapping: dict[str, str], op: str, schema_json: str) -> int:
        """Write manifest v<N+1> then swap the _LATEST pointer. Both
        writes are tmp+rename: a crash at any point leaves the previous
        version fully intact and readable. The committed schema rides
        in the manifest so an EMPTY commit (no data files at all) stays
        readable as a zero-row frame (ADVICE r2)."""
        os.makedirs(self._manifest_dir, exist_ok=True)
        version = (self.latest_version() or 0) + 1
        doc = {
            "version": version,
            "op": op,
            "partitions": mapping,
            "schema": json.loads(schema_json),
        }
        mpath = os.path.join(self._manifest_dir, f"v{version:08d}.json")
        tmp = f"{mpath}.tmp{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        os.rename(tmp, mpath)
        ptr = os.path.join(self.path, "_LATEST")
        tmp = f"{ptr}.tmp{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.rename(tmp, ptr)
        return version

    # -- IO -----------------------------------------------------------------

    def _write_generation(self, df: DataFrame) -> tuple[str, list[str]]:
        """Write df into a fresh generation dir; returns (gen, partition
        leaf dirs written) — [_ROOT] for unpartitioned tables."""
        gen = uuid.uuid4().hex[:12]
        out = self._gen_dir(gen)
        w = df.write.mode("overwrite")
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.parquet(out)
        # An empty frame writes no readable data (partitioned: no leaf
        # dirs; unpartitioned: _SUCCESS only) — commit an empty mapping
        # and let read() rebuild the frame from the manifest schema.
        has_data = any(
            f.endswith(".parquet") for _, _, fs in os.walk(out) for f in fs
        )
        if not has_data:
            shutil.rmtree(out, ignore_errors=True)
            return gen, []
        if not self.partition_by:
            return gen, [_ROOT]
        return gen, leaf_dirs(out, len(self.partition_by))

    def exists(self) -> bool:
        return self.latest_version() is not None

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """The table as of `version` (default: latest). Resolves the
        manifest's partition→generation mapping and unions one read per
        referenced generation (basePath keeps partition columns); a
        compacted table references one generation, an incrementally
        merged one a handful."""
        v = version if version is not None else self.latest_version()
        if v is None:
            raise FileNotFoundError(f"no committed version at {self.path}")
        manifest = self._manifest(v)
        mapping = manifest["partitions"]
        if not mapping:
            from pyspark.sql import types as T

            schema = manifest.get("schema")
            if schema is None:
                raise ValueError(
                    f"version {v} at {self.path} is empty and predates "
                    "schema-carrying manifests — cannot reconstruct"
                )
            return spark.createDataFrame([], T.StructType.fromJson(schema))
        if not self.partition_by:
            return spark.read.parquet(self._gen_dir(mapping[_ROOT]))
        by_gen: dict[str, list[str]] = {}
        for part, gen in mapping.items():
            by_gen.setdefault(gen, []).append(part)
        frames = [
            spark.read.option("basePath", self._gen_dir(gen)).parquet(
                *[os.path.join(self._gen_dir(gen), p) for p in parts]
            )
            for gen, parts in sorted(by_gen.items())
        ]
        return reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), frames
        )

    # -- commits ------------------------------------------------------------

    def overwrite(self, df: DataFrame) -> int:
        """Full refresh (K5) as a new version; prior versions stay
        readable until vacuumed."""
        gen, parts = self._write_generation(df)
        return self._commit({p: gen for p in parts}, "overwrite", df.schema.json())

    def merge(
        self,
        source: DataFrame,
        *,
        mode: str = MergeMode.UPDATE_ALL,
        update_subset: Sequence[str] = (),
        source_order: Sequence[str] = (),
    ) -> int:
        """MERGE INTO … USING source ON key, committed as a new version.

        Same row semantics as ParquetTable.merge (shared merge_rows /
        partition_scope helpers); the difference is the commit: touched
        partitions are written copy-on-write into a new generation and
        the manifest splices them over the parent mapping, so untouched
        partitions are never rewritten AND the parent version remains
        readable.
        """
        keys = list(self.key)
        if source_order:
            source = latest_wins(source, keys, list(source_order))
        else:
            source = source.dropDuplicates(keys)

        spark = source.sparkSession
        if not self.exists():
            gen, parts = self._write_generation(source)
            return self._commit({p: gen for p in parts}, "merge", source.schema.json())

        parent = self._manifest(self.latest_version())["partitions"]
        target = self.read(spark)
        target, source = align_schemas(target, source)

        scoped = False
        if self.partition_by:
            scoped, cond = partition_scope(target, source, keys, self.partition_by)
            if scoped:
                target = target.filter(cond)

        merged = merge_rows(target, source, keys, mode, update_subset)
        gen, parts = self._write_generation(merged)
        if scoped:
            mapping = dict(parent)
            mapping.update({p: gen for p in parts})
        else:
            mapping = {p: gen for p in parts}
        return self._commit(mapping, "merge", merged.schema.json())

    def compact(self, spark: SparkSession) -> int:
        """Rewrite the latest version into a single generation (one
        read per future query) as a new commit."""
        df = self.read(spark)
        gen, parts = self._write_generation(df)
        return self._commit({p: gen for p in parts}, "compact", df.schema.json())

    # -- history ------------------------------------------------------------

    def diff(
        self,
        spark: SparkSession,
        v_old: int,
        v_new: int,
        *,
        compare_cols: Sequence[str] | None = None,
        include_unchanged: bool = False,
    ) -> DataFrame:
        """Exact CDC feed between two committed versions (insert /
        delete / update per key) via operators.history.snapshot_diff."""
        from .history import snapshot_diff

        old, new = self.read(spark, v_old), self.read(spark, v_new)
        old, new = align_schemas(old, new)
        cols = list(
            compare_cols
            if compare_cols is not None
            else [c for c in old.columns if c not in self.key]
        )
        return snapshot_diff(
            old, new, list(self.key), cols, include_unchanged=include_unchanged
        )

    def vacuum(self, *, retain_last: int = 2, min_age_s: int = 3600) -> list[str]:
        """Drop manifests beyond the retention window and delete
        generation dirs no kept manifest references. Returns removed
        paths. The live version is always kept. `min_age_s` protects a
        crashed-or-in-flight writer's freshly written (not yet
        committed) generation from being reclaimed mid-commit — pass 0
        only when no writer can be running (mirrors
        ParquetTable.vacuum's guard)."""
        import time

        vs = self.versions()
        if not vs:
            return []
        keep = set(vs[-max(1, retain_last):])
        live = self.latest_version()
        if live is not None:
            keep.add(live)
        referenced: set[str] = set()
        for v in keep:
            referenced.update(self._manifest(v)["partitions"].values())
        removed: list[str] = []
        for v in vs:
            if v not in keep:
                p = os.path.join(self._manifest_dir, f"v{v:08d}.json")
                os.remove(p)
                removed.append(p)
        cutoff = time.time() - min_age_s
        if os.path.isdir(self._data_dir):
            for gen in os.listdir(self._data_dir):
                if gen in referenced:
                    continue
                full = self._gen_dir(gen)
                try:
                    newest = max(
                        (
                            os.path.getmtime(os.path.join(dp, f))
                            for dp, _, fs in os.walk(full)
                            for f in fs
                        ),
                        default=os.path.getmtime(full),
                    )
                except OSError:
                    continue  # vanished mid-scan — a writer just committed
                if newest > cutoff:
                    continue
                shutil.rmtree(full, ignore_errors=True)
                removed.append(full)
        return removed


