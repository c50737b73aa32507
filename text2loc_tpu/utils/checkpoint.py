"""Orbax checkpointing of the full train state.

The reference saves best-val torch state_dicts with the frozen T5 stripped and
deletes the previous best (/root/reference/training/coarse.py:317-345,
fine.py:266-290); optimizer/scheduler/epoch state is NOT saved, so "resume"
restarts optimization. Here the full TrainState (params + batch_stats +
opt_state + step) checkpoints atomically, enabling true deterministic resume
after preemption (SURVEY.md section 5.3/5.4). The frozen text table is the
analogue of T5 and is likewise excluded — it is a content-addressed asset
rebuilt from the embedder, not training state.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from text2loc_tpu.training.steps import TrainState


class CheckpointManager:
    """Best-metric-gated checkpointing with previous-best cleanup.

    Mirrors the reference's "keep only the best validation checkpoint" policy
    while also keeping `keep_latest` rolling step checkpoints for resume.
    """

    def __init__(self, directory: str, keep_latest: int = 1, mode: str = "max"):
        assert mode in ("max", "min")
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mode = mode
        self.best_metric: Optional[float] = None
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep_latest + 1,
            best_fn=lambda m: m["metric"] if self.mode == "max" else -m["metric"],
            best_mode="max",
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)
        # Recover the best metric from existing checkpoints so a resumed run
        # keeps the save-only-on-improvement gate: without this, the first
        # post-resume eval (however bad) would overwrite the best checkpoint
        # and be reported as the best state.
        bs = self._mgr.best_step()
        if bs is not None:
            m = self._mgr.metrics(bs)
            if m is not None and "metric" in m:
                self.best_metric = float(m["metric"])

    def _is_better(self, metric: float) -> bool:
        if self.best_metric is None:
            return True
        return metric > self.best_metric if self.mode == "max" else metric < self.best_metric

    def save(self, step: int, state: TrainState, metric: float) -> bool:
        """Save if `metric` beats the best so far. Returns True when saved."""
        if not self._is_better(metric):
            return False
        self.best_metric = float(metric)
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(jax.device_get(state)),
            metrics={"metric": float(metric)},
        )
        self._mgr.wait_until_finished()
        return True

    def restore(self, state_like: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore the given (or best/latest) step into a state template."""
        if step is None:
            step = self._mgr.best_step()
            if step is None:
                step = self._mgr.latest_step()
        assert step is not None, f"no checkpoints in {self.directory}"
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(jax.device_get(state_like))
            )
        except (ValueError, KeyError) as e:
            # Keep the original error front and center — a corrupt file or
            # an orbax shape error raises the same types; the key-rename
            # hint below is only ONE possible cause.
            raise ValueError(
                f"failed to restore checkpoint at {self.directory} "
                f"(step {step}): {e}. If the tree keys mismatch and the "
                "checkpoint predates the round-2 explicit submodule names "
                "(MLP_0 -> mlp_pointnet/color_encoder/pos_encoder/"
                "num_encoder/mlp_merge/inter_mlp), retrain or rename the "
                "keys in the checkpoint tree."
            ) from e
        return TrainState(*restored)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()
