"""JAX-native evolution strategies — torch/evotorch-free twin of the
reference's neuroevolution harness (examples/learning_agents.py:20-109).

Two searchers:

* :class:`PGPE` — the reference's configuration (learning_agents.py:63-77):
  symmetric (mirrored) sampling around a center with per-parameter stdev,
  ClipUp optimizer (normalized step, max_speed clipping, momentum 0.9),
  stdev learning rate 0.1.  Follows Sehnke et al. PGPE with the ClipUp update
  of Toklu et al. (2020) — the algorithm evotorch implements.
* :class:`OpenAIES` — Salimans et al. 2017 (the reference README's roadmap
  pointer, README.md:93): rank-shaped antithetic ES with Adam-free SGD.

Everything is a pure jitted update: ``(EsState, key) -> (EsState, pop,
fitnesses -> EsState)`` split so fitness evaluation (vmapped rollouts,
possibly mesh-sharded over the population axis) stays outside the searcher.
The whole generation — sample, rollout population, update — compiles into a
single XLA program in die_tpu/learn/train.py.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

from die_tpu.core.rng import uniform01_from_bits
from die_tpu.core.mathx import normal_from_uniform


class EsState(NamedTuple):
    center: object    # f32[D]
    stdev: object     # f32[D]
    velocity: object  # f32[D] — ClipUp/SGD momentum buffer
    step: object      # i32[]


def _normal(key, shape):
    """Contract-conformant standard normals (bits -> uniform -> erfinv)."""
    bits = jr.bits(key, shape, jnp.uint32)
    return normal_from_uniform(uniform01_from_bits(bits))


def centered_ranks(f):
    """Salimans et al. fitness shaping: ranks mapped to [-0.5, 0.5]."""
    n = f.shape[0]
    idx = jnp.argsort(f)
    ranks = jnp.zeros((n,), jnp.float32).at[idx].set(
        jnp.arange(n, dtype=jnp.float32))
    return ranks / jnp.float32(n - 1) - jnp.float32(0.5)


class PGPE:
    """PGPE + ClipUp with mirrored sampling.

    popsize must be even; the population is [center+e_1, center-e_1, ...].
    """

    def __init__(self,
                 num_params: int,
                 popsize: int = 10,
                 center_learning_rate: float = 0.05,
                 stdev_learning_rate: float = 0.1,
                 stdev_init: float = 0.1,
                 radius_init: float | None = 1.5,
                 max_speed: float | None = 0.1,
                 momentum: float = 0.9,
                 stdev_max_change: float = 0.2):
        assert popsize % 2 == 0, "PGPE popsize must be even (mirrored pairs)"
        self.d = int(num_params)
        self.popsize = int(popsize)
        self.lr_center = float(center_learning_rate)
        self.lr_stdev = float(stdev_learning_rate)
        # evotorch radius semantics: stdev_init = radius / sqrt(D)
        if radius_init is not None:
            stdev_init = float(radius_init) / float(np.sqrt(self.d))
        self.stdev_init = float(stdev_init)
        self.max_speed = float(max_speed) if max_speed is not None else None
        self.momentum = float(momentum)
        self.stdev_max_change = float(stdev_max_change)

    def init(self, center0) -> EsState:
        center0 = jnp.asarray(center0, jnp.float32)
        return EsState(
            center=center0,
            stdev=jnp.full((self.d,), np.float32(self.stdev_init)),
            velocity=jnp.zeros((self.d,), jnp.float32),
            step=jnp.zeros((), jnp.int32),
        )

    def ask(self, state: EsState, key):
        """Sample the mirrored population: f32[popsize, D]."""
        half = self.popsize // 2
        eps = _normal(key, (half, self.d)) * state.stdev[None, :]
        pop = jnp.concatenate([state.center[None, :] + eps,
                               state.center[None, :] - eps], axis=0)
        return pop, eps

    def tell(self, state: EsState, eps, fitnesses) -> EsState:
        """Gradient-from-fitness + ClipUp update (maximization)."""
        half = self.popsize // 2
        f_plus = fitnesses[:half]
        f_minus = fitnesses[half:]
        baseline = jnp.mean(fitnesses)
        f_scale = jnp.maximum(jnp.max(fitnesses) - jnp.min(fitnesses),
                              np.float32(1e-8))

        # center gradient: mean of (f+ - f-)/2 * eps, fitness-range-scaled
        # (eps already carries stdev; ClipUp then normalizes the direction)
        d_center = ((f_plus - f_minus)[:, None] * np.float32(0.5) * eps
                    ).mean(axis=0) / f_scale

        # ClipUp: normalized step, clipped velocity
        gnorm = jnp.sqrt(jnp.sum(d_center * d_center)) + np.float32(1e-12)
        step_v = d_center / gnorm * np.float32(self.lr_center)
        velocity = np.float32(self.momentum) * state.velocity + step_v
        if self.max_speed is not None:
            vnorm = jnp.sqrt(jnp.sum(velocity * velocity)) + np.float32(1e-12)
            velocity = jnp.where(
                vnorm > np.float32(self.max_speed),
                velocity * (np.float32(self.max_speed) / vnorm),
                velocity)
        center = state.center + velocity

        # stdev gradient: ((f+ + f-)/2 - baseline) * (eps^2 - stdev^2)/stdev
        f_avg = (f_plus + f_minus) * np.float32(0.5)
        adv = (f_avg - baseline) / f_scale
        s2 = state.stdev[None, :] * state.stdev[None, :]
        d_stdev = (adv[:, None] * (eps * eps - s2) / state.stdev[None, :]
                   ).mean(axis=0)
        stdev_step = np.float32(self.lr_stdev) * d_stdev
        # bound relative change (evotorch stdev_max_change)
        max_delta = state.stdev * np.float32(self.stdev_max_change)
        stdev = state.stdev + jnp.clip(stdev_step, -max_delta, max_delta)
        stdev = jnp.maximum(stdev, np.float32(1e-6))

        return EsState(center=center, stdev=stdev, velocity=velocity,
                       step=state.step + 1)


class SepCMAES:
    """Separable (diagonal-covariance) CMA-ES — the reference's alternative
    searcher (evotorch ``CMAES(..., separable=True)``, commented at
    examples/learning_agents.py:56-61).  Ros & Hansen 2008 update rules with
    a diagonal C; O(D) memory, suitable for the conv-param scales here.
    """

    def __init__(self, num_params: int, popsize: int = 10,
                 stdev_init: float = 0.1):
        self.d = int(num_params)
        self.popsize = int(popsize)
        self.sigma0 = float(stdev_init)
        d = float(self.d)
        mu = self.popsize // 2
        w = np.log(mu + 0.5) - np.log(np.arange(1, mu + 1))
        self.weights = jnp.asarray((w / w.sum()).astype(np.float32))
        self.mu = mu
        self.mueff = float(1.0 / np.sum((w / w.sum()) ** 2))
        self.cs = (self.mueff + 2.0) / (d + self.mueff + 5.0)
        self.ds = 1.0 + 2.0 * max(0.0, np.sqrt((self.mueff - 1.0) /
                                               (d + 1.0)) - 1.0) + self.cs
        self.cc = (4.0 + self.mueff / d) / (d + 4.0 + 2.0 * self.mueff / d)
        self.c1 = 2.0 / ((d + 1.3) ** 2 + self.mueff)
        self.cmu = min(1.0 - self.c1,
                       2.0 * (self.mueff - 2.0 + 1.0 / self.mueff)
                       / ((d + 2.0) ** 2 + self.mueff))
        # separable variant scales learning rates up by (d+2)/3
        sep = (d + 2.0) / 3.0
        self.c1 *= sep
        self.cmu *= sep
        self.chi_d = float(np.sqrt(d) * (1.0 - 1.0 / (4 * d)
                                         + 1.0 / (21 * d * d)))

    def init(self, center0) -> "CmaState":
        return CmaState(
            mean=jnp.asarray(center0, jnp.float32),
            sigma=jnp.float32(self.sigma0),
            c_diag=jnp.ones((self.d,), jnp.float32),
            p_sigma=jnp.zeros((self.d,), jnp.float32),
            p_c=jnp.zeros((self.d,), jnp.float32),
            step=jnp.zeros((), jnp.int32),
        )

    def ask(self, state: "CmaState", key):
        z = _normal(key, (self.popsize, self.d))
        y = z * jnp.sqrt(state.c_diag)[None, :]
        pop = state.mean[None, :] + state.sigma * y
        return pop, z

    def tell(self, state: "CmaState", z, fitnesses) -> "CmaState":
        order = jnp.argsort(-fitnesses)  # maximize
        z_sel = z[order[:self.mu]]
        y_sel = z_sel * jnp.sqrt(state.c_diag)[None, :]
        z_w = jnp.sum(self.weights[:, None] * z_sel, axis=0)
        y_w = jnp.sum(self.weights[:, None] * y_sel, axis=0)

        mean = state.mean + state.sigma * y_w
        cs, ds, cc = (np.float32(self.cs), np.float32(self.ds),
                      np.float32(self.cc))
        mueff = np.float32(self.mueff)
        p_sigma = (1.0 - cs) * state.p_sigma \
            + jnp.sqrt(cs * (2.0 - cs) * mueff) * z_w
        sigma = state.sigma * jnp.exp(
            (cs / ds) * (jnp.linalg.norm(p_sigma) / np.float32(self.chi_d)
                         - 1.0))
        p_c = (1.0 - cc) * state.p_c \
            + jnp.sqrt(cc * (2.0 - cc) * mueff) * y_w
        rank_mu = jnp.sum(self.weights[:, None] * (y_sel * y_sel), axis=0)
        c_diag = ((1.0 - self.c1 - self.cmu) * state.c_diag
                  + np.float32(self.c1) * (p_c * p_c)
                  + np.float32(self.cmu) * rank_mu)
        c_diag = jnp.maximum(c_diag, np.float32(1e-12))
        return CmaState(mean=mean, sigma=sigma, c_diag=c_diag,
                        p_sigma=p_sigma, p_c=p_c, step=state.step + 1)


class CmaState(NamedTuple):
    mean: object
    sigma: object
    c_diag: object
    p_sigma: object
    p_c: object
    step: object


class FullCmaState(NamedTuple):
    mean: object     # f32[D]
    sigma: object    # f32[]
    cov: object      # f32[D, D]
    evals: object    # f32[D]    — eig(cov), computed when cov changes
    evecs: object    # f32[D, D]
    p_sigma: object  # f32[D]
    p_c: object      # f32[D]
    step: object     # i32[]


class CMAES:
    """Full-covariance CMA-ES (Hansen's tutorial update rules) — twin of the
    reference's commented evotorch ``CMAES`` searcher
    (/root/reference/examples/learning_agents.py:56-61).  The eigendecomposition
    runs once per generation; at the reference's scales (popsize 10, conv
    params ~10^2-10^3) this is negligible next to the rollouts.  For large D
    prefer :class:`SepCMAES` (O(D) memory)."""

    def __init__(self, num_params: int, popsize: int = 10,
                 stdev_init: float = 0.1):
        self.d = int(num_params)
        self.popsize = int(popsize)
        self.sigma0 = float(stdev_init)
        d = float(self.d)
        mu = self.popsize // 2
        w = np.log(mu + 0.5) - np.log(np.arange(1, mu + 1))
        self.weights = jnp.asarray((w / w.sum()).astype(np.float32))
        self.mu = mu
        self.mueff = float(1.0 / np.sum((w / w.sum()) ** 2))
        self.cs = (self.mueff + 2.0) / (d + self.mueff + 5.0)
        self.ds = 1.0 + 2.0 * max(0.0, np.sqrt((self.mueff - 1.0) /
                                               (d + 1.0)) - 1.0) + self.cs
        self.cc = (4.0 + self.mueff / d) / (d + 4.0 + 2.0 * self.mueff / d)
        self.c1 = 2.0 / ((d + 1.3) ** 2 + self.mueff)
        self.cmu = min(1.0 - self.c1,
                       2.0 * (self.mueff - 2.0 + 1.0 / self.mueff)
                       / ((d + 2.0) ** 2 + self.mueff))
        self.chi_d = float(np.sqrt(d) * (1.0 - 1.0 / (4 * d)
                                         + 1.0 / (21 * d * d)))

    def init(self, center0) -> FullCmaState:
        cov = jnp.eye(self.d, dtype=jnp.float32)
        evals, evecs = self._eig(cov)
        return FullCmaState(
            mean=jnp.asarray(center0, jnp.float32),
            sigma=jnp.float32(self.sigma0),
            cov=cov,
            evals=evals,
            evecs=evecs,
            p_sigma=jnp.zeros((self.d,), jnp.float32),
            p_c=jnp.zeros((self.d,), jnp.float32),
            step=jnp.zeros((), jnp.int32),
        )

    def _eig(self, cov):
        # symmetrize before eigh; clamp eigenvalues for numerical safety
        c = (cov + cov.T) * np.float32(0.5)
        evals, evecs = jnp.linalg.eigh(c)
        evals = jnp.maximum(evals, np.float32(1e-12))
        return evals, evecs

    def ask(self, state: FullCmaState, key):
        """pop f32[popsize, D]; returns (pop, y) with y = C^{1/2} z.
        Uses the factorization carried in the state (computed when tell
        updated cov) — one eigh per generation, in tell."""
        z = _normal(key, (self.popsize, self.d))
        # y = B diag(sqrt(evals)) z
        y = (z * jnp.sqrt(state.evals)[None, :]) @ state.evecs.T
        pop = state.mean[None, :] + state.sigma * y
        return pop, y

    def tell(self, state: FullCmaState, y, fitnesses) -> FullCmaState:
        order = jnp.argsort(-fitnesses)  # maximize
        y_sel = y[order[:self.mu]]
        y_w = jnp.sum(self.weights[:, None] * y_sel, axis=0)

        mean = state.mean + state.sigma * y_w
        cs, ds, cc = (np.float32(self.cs), np.float32(self.ds),
                      np.float32(self.cc))
        mueff = np.float32(self.mueff)

        inv_sqrt = (state.evecs
                    * (np.float32(1.0) / jnp.sqrt(state.evals))[None, :]) \
            @ state.evecs.T
        p_sigma = (1.0 - cs) * state.p_sigma \
            + jnp.sqrt(cs * (2.0 - cs) * mueff) * (inv_sqrt @ y_w)
        t1 = state.step.astype(jnp.float32) + np.float32(1.0)
        ps_norm = jnp.linalg.norm(p_sigma)
        denom = jnp.sqrt(np.float32(1.0)
                         - (np.float32(1.0) - cs) ** (2.0 * t1))
        hsig = (ps_norm / denom / np.float32(self.chi_d)
                < np.float32(1.4 + 2.0 / (self.d + 1.0))).astype(jnp.float32)
        p_c = (1.0 - cc) * state.p_c \
            + hsig * jnp.sqrt(cc * (2.0 - cc) * mueff) * y_w

        rank_mu = jnp.einsum("i,ij,ik->jk", self.weights, y_sel, y_sel)
        c1, cmu = np.float32(self.c1), np.float32(self.cmu)
        cov = ((1.0 - c1 - cmu) * state.cov
               + c1 * (jnp.outer(p_c, p_c)
                       + (1.0 - hsig) * cc * (2.0 - cc) * state.cov)
               + cmu * rank_mu)
        sigma = state.sigma * jnp.exp(
            (cs / ds) * (ps_norm / np.float32(self.chi_d) - 1.0))
        evals, evecs = self._eig(cov)  # the generation's ONE eigh
        return FullCmaState(mean=mean, sigma=sigma, cov=cov,
                            evals=evals, evecs=evecs,
                            p_sigma=p_sigma, p_c=p_c, step=state.step + 1)


class OpenAIES:
    """Antithetic OpenAI-ES with centered-rank shaping (Salimans et al. 2017)."""

    def __init__(self, num_params: int, popsize: int = 16,
                 learning_rate: float = 0.02, stdev: float = 0.05,
                 momentum: float = 0.0):
        assert popsize % 2 == 0
        self.d = int(num_params)
        self.popsize = int(popsize)
        self.lr = float(learning_rate)
        self.sigma = float(stdev)
        self.momentum = float(momentum)

    def init(self, center0) -> EsState:
        return EsState(center=jnp.asarray(center0, jnp.float32),
                       stdev=jnp.full((self.d,), np.float32(self.sigma)),
                       velocity=jnp.zeros((self.d,), jnp.float32),
                       step=jnp.zeros((), jnp.int32))

    def ask(self, state: EsState, key):
        half = self.popsize // 2
        eps = _normal(key, (half, self.d)) * np.float32(self.sigma)
        pop = jnp.concatenate([state.center[None, :] + eps,
                               state.center[None, :] - eps], axis=0)
        return pop, eps

    def tell(self, state: EsState, eps, fitnesses) -> EsState:
        shaped = centered_ranks(fitnesses)
        half = self.popsize // 2
        w = shaped[:half] - shaped[half:]
        grad = (w[:, None] * eps).mean(axis=0) / np.float32(self.sigma**2)
        velocity = np.float32(self.momentum) * state.velocity \
            + np.float32(self.lr) * grad
        return EsState(center=state.center + velocity, stdev=state.stdev,
                       velocity=velocity, step=state.step + 1)


def es_center(state):
    """Searcher-agnostic center/mean accessor."""
    return state.center if hasattr(state, "center") else state.mean


def es_spread(state):
    """Searcher-agnostic per-parameter search spread."""
    if hasattr(state, "stdev"):
        return state.stdev
    if hasattr(state, "cov"):
        return state.sigma * jnp.sqrt(jnp.diagonal(state.cov))
    return state.sigma * jnp.sqrt(state.c_diag)

def shard_population(mesh, axis, *arrays):
    """Pin the leading (population) axis of each array to a mesh axis —
    ES members then evaluate data-parallel across devices/hosts (SURVEY
    §5.8: population sharded across the same mesh).  Identity when mesh is
    None; results are bitwise identical to the unsharded evaluation (pure
    per-member map; the fitness vector is gathered in index order)."""
    if mesh is None:
        return arrays if len(arrays) > 1 else arrays[0]
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    sh = NamedSharding(mesh, PartitionSpec(axis))
    out = tuple(jax.lax.with_sharding_constraint(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]

def unshard_population(mesh, *arrays):
    """Gather population-sharded arrays back to replicated before the ES
    update — keeps tell()'s fp32 reductions in the unsharded order, so the
    sharded run is bitwise identical to the single-device run."""
    if mesh is None:
        return arrays if len(arrays) > 1 else arrays[0]
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    sh = NamedSharding(mesh, PartitionSpec())
    out = tuple(jax.lax.with_sharding_constraint(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]
