"""Checkpointed / resumable cross-validation sweeps.

The reference has no checkpoint-resume story (fits are seconds-scale;
SURVEY.md §5).  At north-star scale a CV sweep is hours of chip time, so
replicates must be restartable.  Both LOO folds and LSO replicates are
deterministic given (data, A, partition source), and their error blocks
are independent — so a sweep can run in ranges, persist each range's
errors, and resume from the last completed range after any failure.

    runner = ResumableCV("sweep_dir")
    res = runner.run_lso(X, Y, A, 0.3, 10_000, partitions=parts,
                         range_size=500)
    # kill it at any point; re-invoking continues from the first missing
    # range and returns the assembled Residual.

Storage is one .npz per range (atomic rename), so concurrent workers can
also split ranges across hosts and a reducer can assemble partial PRESS —
the "fold-level recomputation" failure-domain from SURVEY.md §5.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from pls_tpu.cv.loo import cv_loo, cv_loo_downdate
from pls_tpu.cv.lso import cv_lso
from pls_tpu.types import METHOD, Residual


class ResumableCV:
    def __init__(self, directory: str):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)

    def _range_path(self, kind: str, start: int, stop: int) -> Path:
        return self.dir / f"{kind}_{start:08d}_{stop:08d}.npz"

    def _save_range(self, path: Path, errors: np.ndarray) -> None:
        tmp = path.with_suffix(".tmp.npz")
        np.savez(tmp, errors=errors)
        os.replace(tmp, path)  # atomic publish

    @staticmethod
    def _parse_range(path: Path) -> tuple[int, int] | None:
        """(start, stop) for a completed-range file; None for anything
        else (in particular orphaned *.tmp.npz files left by a crash
        between savez and the atomic rename)."""
        parts = path.stem.split("_")
        if len(parts) != 3 or not (parts[1].isdigit() and parts[2].isdigit()):
            return None
        return int(parts[1]), int(parts[2])

    def run_lso(
        self,
        X,
        Y,
        A: int,
        test_fraction: float,
        num_trials: int,
        *,
        partitions,
        range_size: int = 256,
        method: METHOD = METHOD.KERNEL_TYPE1,
        batch_size: int | None = None,
        **kw,
    ) -> Residual:
        """LSO in resumable replicate ranges.  `partitions` must be the full
        (num_trials, N) matrix (deterministic, e.g. from GccRng or
        random_partitions) so any range can be recomputed independently."""
        partitions = np.asarray(partitions)
        if partitions.shape[0] != num_trials:
            raise ValueError("partitions rows != num_trials")
        chunks = []
        for start in range(0, num_trials, range_size):
            stop = min(start + range_size, num_trials)
            path = self._range_path("lso", start, stop)
            if path.exists():
                chunks.append(np.load(path)["errors"])
                continue
            r = cv_lso(
                X, Y, A, test_fraction, stop - start, method,
                partitions=partitions[start:stop], batch_size=batch_size, **kw,
            )
            errs = np.asarray(r.errors)
            self._save_range(path, errs)
            chunks.append(errs)
        return Residual(errors=np.concatenate(chunks, axis=1), method="LSO")

    def run_loo(
        self,
        X,
        Y,
        A: int,
        *,
        range_size: int = 256,
        method: METHOD = METHOD.KERNEL_TYPE1,
        downdate: bool = False,
        batch_size: int | None = None,
        **kw,
    ) -> Residual:
        """LOO in resumable fold ranges."""
        N = np.asarray(X).shape[0]
        chunks = []
        for start in range(0, N, range_size):
            stop = min(start + range_size, N)
            path = self._range_path("loo", start, stop)
            if path.exists():
                chunks.append(np.load(path)["errors"])
                continue
            if downdate:
                import jax.numpy as jnp

                r = cv_loo_downdate(
                    X, Y, A, fold_indices=jnp.arange(start, stop),
                    batch_size=batch_size, **kw,
                )
            else:
                # masked-vmap LOO over a fold subrange: the shared fold
                # body with explicit indices
                import jax.numpy as jnp

                from pls_tpu.cv.loo import make_loo_fold_fn
                from pls_tpu.utils.batching import padded_map

                Xj = jnp.asarray(X)
                Yj = jnp.asarray(Y)
                if Yj.ndim == 1:
                    Yj = Yj[:, None]
                fold = make_loo_fold_fn(Xj, Yj, A, method, **kw)
                errs = padded_map(
                    fold, jnp.arange(start, stop), batch_size or 64
                )
                r = Residual(
                    errors=jnp.transpose(errs, (2, 0, 1)), method="LOO"
                )
            errs = np.asarray(r.errors)
            self._save_range(path, errs)
            chunks.append(errs)
        return Residual(errors=np.concatenate(chunks, axis=1), method="LOO")

    def completed_ranges(self, kind: str) -> list[tuple[int, int]]:
        out = []
        for p in sorted(self.dir.glob(f"{kind}_*.npz")):
            r = self._parse_range(p)
            if r is not None:
                out.append(r)
        return out

    def clean_orphans(self) -> int:
        """Remove *.tmp.npz files left by a crash mid-save; returns count.
        Safe to call any time — completed ranges are never touched."""
        n = 0
        for p in self.dir.glob("*.tmp.npz"):
            p.unlink()
            n += 1
        return n
