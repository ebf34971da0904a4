"""Diffusion samplers in JAX.

The reference relies on diffusers' schedulers: PixArt pipelines default to
DPMSolverMultistepScheduler (algorithm dpmsolver++, order 2, epsilon
prediction, linear betas 1e-4→2e-2 over 1000 train steps) and FLUX uses
FlowMatchEulerDiscreteScheduler with dynamic shifting. These are standard
published algorithms (DPM-Solver++: arXiv:2211.01095; rectified flow Euler);
we implement them directly with stateless step functions whose carried state
is a small pytree — scan/unroll friendly under jit.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# DPM-Solver++ (2M), epsilon-prediction, for PixArt
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DPMSolverSchedule:
    """Precomputed per-step constants (host-side numpy; closed over by the
    jitted loop so nothing is recomputed on device)."""

    timesteps: np.ndarray  # (steps,) int — train-timestep indices, descending
    alpha_t: np.ndarray  # (steps,) sqrt(alphas_cumprod)
    sigma_t: np.ndarray  # (steps,)
    lambda_t: np.ndarray  # (steps,) log(alpha/sigma)
    init_noise_sigma: float = 1.0

    @property
    def num_steps(self) -> int:
        return len(self.timesteps)


def make_dpm_schedule(
    num_inference_steps: int,
    num_train_timesteps: int = 1000,
    beta_start: float = 1e-4,
    beta_end: float = 2e-2,
) -> DPMSolverSchedule:
    betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    alphas_cumprod = np.cumprod(1.0 - betas)
    # linspace timestep spacing (diffusers default for DPMSolverMultistep)
    timesteps = (
        np.linspace(0, num_train_timesteps - 1, num_inference_steps + 1)
        .round()[::-1][:-1]
        .astype(np.int64)
    )
    ac = alphas_cumprod[timesteps]
    alpha_t = np.sqrt(ac)
    sigma_t = np.sqrt(1.0 - ac)
    lambda_t = np.log(alpha_t) - np.log(sigma_t)
    return DPMSolverSchedule(
        timesteps=timesteps,
        alpha_t=alpha_t,
        sigma_t=sigma_t,
        lambda_t=lambda_t,
    )


class DPMState(NamedTuple):
    x: jnp.ndarray  # current latents
    prev_x0: jnp.ndarray  # previous data prediction (zeros before first step)
    have_prev: bool  # static: whether prev_x0 is valid


def dpm_step(
    schedule: DPMSolverSchedule,
    step_index: int,
    eps: jnp.ndarray,
    state: DPMState,
) -> DPMState:
    """One DPM-Solver++ 2M update. `step_index` is a static Python int, so
    all scalar coefficients fold into the compiled program as constants."""
    s = schedule
    i = step_index
    a_t, s_t, l_t = s.alpha_t[i], s.sigma_t[i], s.lambda_t[i]
    x = state.x
    x32 = x.astype(jnp.float32)
    eps32 = eps.astype(jnp.float32)
    x0 = (x32 - s_t * eps32) / a_t

    if i == s.num_steps - 1:
        # final step: first-order (sigma_next = 0 → x = x0)
        new_x = x0
        return DPMState(new_x.astype(x.dtype), x0, True)

    a_n, s_n, l_n = s.alpha_t[i + 1], s.sigma_t[i + 1], s.lambda_t[i + 1]
    h = l_n - l_t
    if not state.have_prev:
        # first-order (DPM-Solver++ 1S)
        new_x = (s_n / s_t) * x32 - a_n * (math.exp(-h) - 1.0) * x0
    else:
        l_p = s.lambda_t[i - 1]
        h_prev = l_t - l_p
        r = h_prev / h
        d = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * state.prev_x0.astype(jnp.float32)
        new_x = (s_n / s_t) * x32 - a_n * (math.exp(-h) - 1.0) * d
    return DPMState(new_x.astype(x.dtype), x0, True)


# ---------------------------------------------------------------------------
# FlowMatch Euler (FLUX)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FlowMatchSchedule:
    sigmas: np.ndarray  # (steps+1,) descending, last = 0
    timesteps: np.ndarray  # (steps,) sigma·1000 as flux model input

    @property
    def num_steps(self) -> int:
        return len(self.timesteps)


def make_flow_schedule(
    num_inference_steps: int,
    image_seq_len: int,
    *,
    base_shift: float = 0.5,
    max_shift: float = 1.15,
    base_seq_len: int = 256,
    max_seq_len: int = 4096,
    num_train_timesteps: int = 1000,
) -> FlowMatchSchedule:
    """FLUX's resolution-dependent sigma shift ("dynamic shifting"): the
    shift parameter mu interpolates linearly in sequence length."""
    sigmas = np.linspace(1.0, 1.0 / num_inference_steps, num_inference_steps)
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    mu = image_seq_len * m + b
    sigmas = math.exp(mu) / (math.exp(mu) + (1.0 / sigmas - 1.0))
    timesteps = sigmas * num_train_timesteps
    sigmas = np.append(sigmas, 0.0)
    return FlowMatchSchedule(sigmas=sigmas, timesteps=timesteps)


def flow_step(
    schedule: FlowMatchSchedule,
    step_index: int,
    velocity: jnp.ndarray,
    x: jnp.ndarray,
) -> jnp.ndarray:
    s = schedule
    dt = s.sigmas[step_index + 1] - s.sigmas[step_index]
    return (x.astype(jnp.float32) + dt * velocity.astype(jnp.float32)).astype(
        x.dtype
    )


def dpm_scan_coeffs(schedule: DPMSolverSchedule) -> np.ndarray:
    """Per-step update coefficients for a scan-form DPM-Solver++ 2M loop:

        x_next = c0·x − c1·(d0·x0 + d1·prev_x0)

    where x0 = (x − sigma_t·eps)/alpha_t, the first step is first-order
    (d0=1, d1=0) and the final step integrates to sigma=0 (c0=0, c1=−1 ⇒
    x_next = x0). Returns (steps, 7):
    [timestep, sigma_t, alpha_t, c0, c1, d0, d1]."""
    import math as _math

    s = schedule
    n = s.num_steps
    out = np.zeros((n, 7), dtype=np.float64)
    for i in range(n):
        out[i, 0] = s.timesteps[i]
        out[i, 1] = s.sigma_t[i]
        out[i, 2] = s.alpha_t[i]
        if i == n - 1:
            out[i, 3:] = (0.0, -1.0, 1.0, 0.0)
            continue
        h = s.lambda_t[i + 1] - s.lambda_t[i]
        c0 = s.sigma_t[i + 1] / s.sigma_t[i]
        c1 = s.alpha_t[i + 1] * (_math.exp(-h) - 1.0)
        if i == 0:
            d0, d1 = 1.0, 0.0
        else:
            r = (s.lambda_t[i] - s.lambda_t[i - 1]) / h
            d0 = 1.0 + 1.0 / (2.0 * r)
            d1 = -1.0 / (2.0 * r)
        out[i, 3:] = (c0, c1, d0, d1)
    return out
