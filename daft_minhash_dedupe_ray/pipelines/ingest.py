"""Continuous-ingest corpus: the operational loop the incremental operators
exist for, packaged as one resumable surface.

At 100 TB the corpus is append-only and waves arrive forever; the loop per
wave is (1) resolve the wave's own duplicates, (2) drop rows already in the
corpus — exact then near — at wave-sized cost against the persisted
indexes, (3) append the survivors as a new immutable wave directory,
(4) absorb the survivors into both indexes in place.  The corpus body is
NEVER re-read or re-hashed by any step; per-wave work is proportional to
the wave.

Layout under ``root`` (all paths must be on a filesystem every Ray worker
mounts — same contract as the index probes)::

    corpus/wave=00000/   immutable partitioned parquet + _MANIFEST/_SUCCESS
    exact_index/         content-hash index  (functions/incremental.py)
    band_index/          LSH band-key index
    _INGEST_LOG.jsonl    one line per committed wave (the commit point)

Crash story: the log line is the commit.  A wave directory with _SUCCESS
but no log line means the save landed but index absorption is uncertain —
:meth:`IngestCorpus.recover` re-absorbs that wave (index updates are
idempotent union-merges) and writes the missing line; a wave directory
without _SUCCESS is torn output and is wiped for id reuse.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time

from ..sources.io import partitioned_save


def _wave_dir(root: str, wave: int) -> str:
    return os.path.join(root, "corpus", f"wave={wave:05d}")


class IngestCorpus:
    """Resumable continuous-ingest corpus rooted at ``root``.

    ``cfg`` is the :class:`..config.DedupeConfig` shared by every wave
    (signature config is fingerprint-pinned in the band index, so changing
    it requires a rebuild — the same guard as the probe path).
    """

    def __init__(self, root: str, cfg, chunk_size: int = 200_000) -> None:
        self.root = root
        self.cfg = cfg
        self.chunk_size = chunk_size
        self.exact_index = os.path.join(root, "exact_index")
        self.band_index = os.path.join(root, "band_index")
        self.log_path = os.path.join(root, "_INGEST_LOG.jsonl")
        # with an image side configured, the near index must carry BOTH
        # tiers (caption bands + pHash sub-bands with Hamming payloads) —
        # a caption-only band index would silently pass pHash-only
        # near-dups of absorbed images across waves
        self.image_tier = cfg.phash_col is not None
        os.makedirs(os.path.join(root, "corpus"), exist_ok=True)

    # ---------------------------------------------------------------- state

    def committed_waves(self) -> list[int]:
        if not os.path.exists(self.log_path):
            return []
        with open(self.log_path) as f:
            return [json.loads(line)["wave"] for line in f if line.strip()]

    def _expected_band_kind(self) -> str:
        return "image_band" if self.image_tier else "band"

    def _band_index_kind(self) -> str | None:
        """Kind of the near index ON DISK (None if absent) — the disk is
        authoritative: a corpus ingested with one tier must not be probed
        or absorbed with the other (a caption-only probe would silently
        pass pHash near-dups; a mismatched update would corrupt)."""
        if not os.path.exists(os.path.join(self.band_index, "_SUCCESS")):
            return None
        with open(os.path.join(self.band_index, "_META.json")) as f:
            return json.load(f).get("kind")

    def _check_band_kind(self) -> None:
        disk = self._band_index_kind()
        if disk is not None and disk != self._expected_band_kind():
            raise ValueError(
                f"the corpus at {self.root!r} carries a {disk!r} near index "
                f"but this config implies {self._expected_band_kind()!r} "
                f"(phash_col={self.cfg.phash_col!r}) — re-run with the "
                "matching config, or call rebuild_band_index() to rebuild "
                "the index from the committed corpus under the new config"
            )

    def rebuild_band_index(self) -> dict:
        """Rebuild the near index from the FULL committed corpus under the
        current config — the safe remediation for a tier/config change or a
        torn/lost index (building from a single wave would silently drop
        every earlier wave's keys).  Builds into a sibling tmp dir and swaps
        so a crash mid-rebuild leaves either the old index intact or no
        index (never a single-wave index passing as complete)."""
        from ..functions.incremental import build_band_index, build_image_band_index

        build = build_image_band_index if self.image_tier else build_band_index
        tmp = self.band_index + ".build.tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        meta = build(self.read_corpus(), tmp, self.cfg)
        shutil.rmtree(self.band_index, ignore_errors=True)
        os.replace(tmp, self.band_index)
        return meta

    def rebuild_exact_index(self) -> dict:
        """Exact-index counterpart of :meth:`rebuild_band_index` (same
        full-corpus build + tmp-dir swap discipline)."""
        from ..functions.incremental import build_corpus_index

        tmp = self.exact_index + ".build.tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        meta = build_corpus_index(
            self.read_corpus(), tmp, text_col=self.cfg.content_col
        )
        shutil.rmtree(self.exact_index, ignore_errors=True)
        os.replace(tmp, self.exact_index)
        return meta

    def _check_indexes_complete(self) -> None:
        """With committed waves on disk, BOTH indexes must carry _SUCCESS:
        a missing/torn index silently skips its probe AND would otherwise be
        rebuilt from a single wave in _absorb — either way every earlier
        wave's keys vanish and future waves pass pre-existing duplicates
        undetected (permanent silent under-dedupe).  Fail loudly instead and
        direct to the full-corpus rebuild."""
        if not self.committed_waves():
            return
        for path, fix in (
            (self.exact_index, "rebuild_exact_index()"),
            (self.band_index, "rebuild_band_index()"),
        ):
            if not os.path.exists(os.path.join(path, "_SUCCESS")):
                raise RuntimeError(
                    f"corpus at {self.root!r} has committed waves but "
                    f"{path!r} has no _SUCCESS (torn or deleted index) — "
                    f"run IngestCorpus.{fix} to rebuild it from the full "
                    "committed corpus before ingesting"
                )

    def read_corpus(self):
        """One Dataset over every committed wave (column-prunable parquet)."""
        import ray.data as rd

        waves = self.committed_waves()
        if not waves:
            raise FileNotFoundError(f"no committed waves under {self.root!r}")
        files = []  # ray 2.49's read_parquet rejects directories in a list
        for w in sorted(waves):
            d = _wave_dir(self.root, w)
            files += sorted(
                os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
            )
        return rd.read_parquet(files)

    # ------------------------------------------------------------- recovery

    def recover(self) -> list[int]:
        """Finish partially-ingested waves: wipe torn saves, re-absorb saved
        -but-uncommitted waves (idempotent), write their missing log lines.
        Called automatically at the top of :meth:`ingest`."""
        import ray.data as rd

        self._check_band_kind()
        self._check_indexes_complete()
        committed = set(self.committed_waves())
        recovered = []
        cdir = os.path.join(self.root, "corpus")
        for name in sorted(os.listdir(cdir)):
            m = re.fullmatch(r"wave=(\d{5,})", name)
            if not m:
                continue
            w = int(m.group(1))
            d = os.path.join(cdir, name)
            if w in committed:
                continue
            if not os.path.exists(os.path.join(d, "_SUCCESS")):
                shutil.rmtree(d)  # torn save: the id is reused
                continue
            survivors = rd.read_parquet(d)
            self._absorb(survivors)
            with open(os.path.join(d, "_MANIFEST.json")) as f:
                rows_kept = json.load(f)["rows"]
            self._commit(w, rows_in=None, rows_kept=rows_kept, recovered=True)
            recovered.append(w)
        return recovered

    # --------------------------------------------------------------- ingest

    def ingest(self, wave_ds, intra_wave: bool = True, num_actors: int = 4) -> dict:
        """Run the full loop on one wave; returns the committed log entry.

        ``intra_wave=True`` first resolves the wave's own near+exact
        duplicates with the flagship pipeline (min-id-wins); set False when
        the wave is already internally deduped (e.g. replayed output)."""
        from ..functions.incremental import (
            incremental_dedupe_indexed,
            incremental_image_near_dedupe_indexed,
            incremental_near_dedupe_indexed,
        )

        t0 = time.perf_counter()
        self._check_band_kind()  # fail fast BEFORE any work on a tier mismatch
        self.recover()
        wave = (max(self.committed_waves(), default=-1)) + 1

        rows_in = None
        survivors = wave_ds
        if intra_wave:
            from .dedupe import MinHashDedupePipeline

            survivors, _, rep = MinHashDedupePipeline(self.cfg).run_fused(
                survivors, num_actors=num_actors, materialize_output=False
            )
            rows_in = rep.rows_before  # free; no extra pass over the wave
        if os.path.exists(os.path.join(self.exact_index, "_SUCCESS")):
            survivors = incremental_dedupe_indexed(
                survivors,
                self.exact_index,
                text_col=self.cfg.content_col,
                id_col=self.cfg.index_col,
            )
        if os.path.exists(os.path.join(self.band_index, "_SUCCESS")):
            survivors = (
                incremental_image_near_dedupe_indexed(survivors, self.band_index, self.cfg)
                if self.image_tier
                else incremental_near_dedupe_indexed(survivors, self.band_index, self.cfg)
            )
        # one execution of the chain; the save and both index updates then
        # read object-store blocks instead of re-running the dedupe twice
        survivors = survivors.materialize()
        if rows_in is None:
            rows_in = wave_ds.count()
        manifest = partitioned_save(
            survivors, _wave_dir(self.root, wave), chunk_size=self.chunk_size
        )
        rows_kept = manifest["rows"]
        corpus_distinct = self._absorb(survivors)
        return self._commit(
            wave,
            rows_in=rows_in,
            rows_kept=rows_kept,
            corpus_distinct=corpus_distinct,
            wall_s=round(time.perf_counter() - t0, 2),
        )

    def _absorb(self, survivors) -> int:
        """Absorb survivor rows into both indexes (build on first wave)."""
        from ..functions import incremental as inc

        if os.path.exists(os.path.join(self.exact_index, "_SUCCESS")):
            meta = inc.update_corpus_index(survivors, self.exact_index)
        else:
            meta = inc.build_corpus_index(
                survivors, self.exact_index, text_col=self.cfg.content_col
            )
        build, update = (
            (inc.build_image_band_index, inc.update_image_band_index)
            if self.image_tier
            else (inc.build_band_index, inc.update_band_index)
        )
        if os.path.exists(os.path.join(self.band_index, "_SUCCESS")):
            update(survivors, self.band_index, self.cfg)
        else:
            build(survivors, self.band_index, self.cfg)
        return sum(meta["parts"].values())

    def _commit(self, wave: int, **fields) -> dict:
        entry = {"wave": wave, "committed_at": time.time(), **fields}
        with open(self.log_path, "a") as f:
            f.write(json.dumps(entry) + "\n")
        return entry
