"""Checkpoint / resume for episodes (SURVEY.md §5).

Episode state is tiny — sampled indices, measurements, noise scales,
hyperparameters, pose, remaining budget, RNG state — so a single .npz
round-trips it.  Selection is a pure function of this state (the greedy
loops are deterministic given state), so resume is exact.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from algp_tpu.ops.kernels import KernelParams


@dataclasses.dataclass
class EpisodeState:
    sampled_idx: np.ndarray  # (n,) int64 grid indices sampled so far
    y: np.ndarray  # (n,) measurements
    noise_scale: np.ndarray  # (n,) heteroscedastic variance multipliers
    pose: int  # current grid index of the robot
    budget_left: float
    step: int
    params: Optional[KernelParams] = None  # fitted hyperparameters
    rng_state: Optional[dict] = None  # np.random.Generator bit state
    mlp: Optional[list] = None  # deep-kernel embedding weights [(W, b)…]
    goal_i: int = 0  # next EpisodeConfig.waypoint_goals entry to visit
    # EpisodeConfig.lagged_refit: a refit result dispatched but not yet
    # consumed by a plan (applied just before the NEXT plan).  Saved so a
    # resumed run replays the apply point exactly.
    pending_params: Optional[KernelParams] = None
    # multi-trait envs (FieldConfig.num_traits > 1 / table value_cols):
    # ALL traits measured at each visited plot, (n, T) with column 0 ==
    # y (the designated planning trait).  None on single-trait episodes.
    y_traits: Optional[np.ndarray] = None


def save(path: str, state: EpisodeState) -> None:
    blobs = {
        "sampled_idx": state.sampled_idx,
        "y": state.y,
        "noise_scale": state.noise_scale,
        "pose": np.asarray(state.pose),
        "budget_left": np.asarray(state.budget_left),
        "step": np.asarray(state.step),
        "goal_i": np.asarray(state.goal_i),
    }
    if state.params is not None:
        blobs.update(
            p_ls_spatial=np.asarray(state.params.log_ls_spatial),
            p_ls_feature=np.asarray(state.params.log_ls_feature),
            p_outputscale=np.asarray(state.params.log_outputscale),
            p_noise=np.asarray(state.params.log_noise),
        )
    if state.y_traits is not None:
        blobs["y_traits"] = state.y_traits
    if state.pending_params is not None:
        blobs.update(
            q_ls_spatial=np.asarray(state.pending_params.log_ls_spatial),
            q_ls_feature=np.asarray(state.pending_params.log_ls_feature),
            q_outputscale=np.asarray(state.pending_params.log_outputscale),
            q_noise=np.asarray(state.pending_params.log_noise),
        )
    if state.rng_state is not None:
        import json

        blobs["rng_state_json"] = np.frombuffer(
            json.dumps(state.rng_state).encode(), dtype=np.uint8
        )
    if state.mlp is not None:
        blobs["mlp_layers"] = np.asarray(len(state.mlp))
        for i, (W, b) in enumerate(state.mlp):
            blobs[f"mlp_W{i}"] = np.asarray(W)
            blobs[f"mlp_b{i}"] = np.asarray(b)
    np.savez(path, **blobs)


def load(path: str) -> EpisodeState:
    import jax.numpy as jnp

    z = np.load(path)
    params = None
    if "p_ls_spatial" in z:
        params = KernelParams(
            log_ls_spatial=jnp.asarray(z["p_ls_spatial"]),
            log_ls_feature=jnp.asarray(z["p_ls_feature"]),
            log_outputscale=jnp.asarray(z["p_outputscale"]),
            log_noise=jnp.asarray(z["p_noise"]),
        )
    pending = None
    if "q_ls_spatial" in z:
        pending = KernelParams(
            log_ls_spatial=jnp.asarray(z["q_ls_spatial"]),
            log_ls_feature=jnp.asarray(z["q_ls_feature"]),
            log_outputscale=jnp.asarray(z["q_outputscale"]),
            log_noise=jnp.asarray(z["q_noise"]),
        )
    rng_state = None
    if "rng_state_json" in z:
        import json

        rng_state = json.loads(z["rng_state_json"].tobytes().decode())
    mlp = None
    if "mlp_layers" in z:
        mlp = [
            (jnp.asarray(z[f"mlp_W{i}"]), jnp.asarray(z[f"mlp_b{i}"]))
            for i in range(int(z["mlp_layers"]))
        ]
    return EpisodeState(
        sampled_idx=z["sampled_idx"],
        y=z["y"],
        noise_scale=z["noise_scale"],
        pose=int(z["pose"]),
        budget_left=float(z["budget_left"]),
        step=int(z["step"]),
        params=params,
        rng_state=rng_state,
        mlp=mlp,
        # absent in pre-round-4 checkpoints — default to the first goal
        goal_i=int(z["goal_i"]) if "goal_i" in z.files else 0,
        # absent in pre-round-5 checkpoints (and in synchronous-refit /
        # single-trait runs respectively)
        pending_params=pending,
        y_traits=z["y_traits"] if "y_traits" in z.files else None,
    )
