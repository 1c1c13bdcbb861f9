"""Cross-cutting helpers (``utils/__init__.py:29-76`` analogues):
device info, directory helpers, seeding, optional wandb logger, timing."""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import jax
import numpy as np


def get_default_device():
    """The reference picks cuda->mps->cpu (``utils/__init__.py:29-37``);
    here JAX owns placement — this reports the default backend for logs."""
    return jax.devices()[0]


def ensure_dir(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path


def stable_hash(*parts) -> int:
    """Deterministic 32-bit digest of the stringified parts.

    Python's ``hash()`` is salted per process for strings, so using it to
    derive RNG folds breaks ``--seed`` reproducibility across invocations;
    crc32 is stable everywhere."""
    import zlib

    return zlib.crc32("-".join(map(str, parts)).encode())


def set_global_seeds(seed: int):
    """Seed numpy (host-side shuffles/sklearn) and return a JAX root key.

    JAX sampling is explicit-key everywhere, so unlike the reference
    (``utils/__init__.py:46-56``) there is no global torch RNG to pin —
    determinism comes from threading the returned key."""
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


class Timer:
    """Wall-clock section timing dumped to *_timing.json
    (``mnist_clifpws.py:700-705`` schema)."""

    def __init__(self):
        self.t0 = time.time()
        self.sections: Dict[str, float] = {}
        self._marks: Dict[str, float] = {}

    def start(self, name: str):
        self._marks[name] = time.time()

    def stop(self, name: str):
        if name in self._marks:
            self.sections[name] = self.sections.get(name, 0.0) + (
                time.time() - self._marks.pop(name))

    def total(self) -> float:
        return time.time() - self.t0

    def dump(self, path: str):
        out = dict(self.sections)
        out["total_seconds"] = self.total()
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        return out


class WandbLogger:
    """No-op-safe wandb wrapper (``utils/wandb_utils.py:296-340``)."""

    def __init__(self, args):
        try:
            import wandb  # noqa: F401

            self._wandb = wandb
        except Exception:
            self._wandb = None
        self.use = (self._wandb is not None) and (
            not getattr(args, "no_wandb", True))
        self.project = getattr(args, "wandb_project", None)
        self.run = None

    def start_run(self, name, args):
        if self.use:
            self.run = self._wandb.init(
                project=self.project, name=name, config=vars(args))

    # the reference's ``watch_model`` (wandb.watch gradient histograms,
    # wandb_utils.py:306-310) has no torch-hook equivalent in JAX; its
    # role is covered by the per-epoch ``train/grad_norm`` metric the
    # train steps compute in-graph (train/loop.py) and the runners log.

    def log_metrics(self, d):
        if self.use and self.run is not None:
            try:
                self.run.log(d)
            except Exception:
                pass

    def log_summary(self, d):
        if self.use and self.run is not None:
            try:
                self.run.summary.update(d)
            except Exception:
                pass

    def log_images(self, images):
        if self.use and self.run is not None:
            try:
                to_log = {}
                for k, v in images.items():
                    if isinstance(v, str) and os.path.exists(v):
                        to_log[k] = self._wandb.Image(v)
                    else:
                        to_log[k] = v
                self.run.log(to_log)
            except Exception:
                pass

    def finish_run(self):
        if self.use and self.run is not None:
            self.run.finish()


CLASS_NAMES = {
    "fashionmnist": [
        "T-shirt/top", "Trouser", "Pullover", "Dress", "Coat",
        "Sandal", "Shirt", "Sneaker", "Bag", "Ankle boot",
    ],
    "mnist": [str(i) for i in range(10)],
    "mnist32": [str(i) for i in range(10)],  # digit shard at CNN geometry
    "cifar10": [
        "airplane", "automobile", "bird", "cat", "deer",
        "dog", "frog", "horse", "ship", "truck",
    ],
}
