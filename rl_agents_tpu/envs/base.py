"""Functional environment core.

The reference uses *the environment itself* as the planning model, forked via
``safe_deepcopy_env`` (reference: rl_agents/agents/common/factory.py:119-134)
— the dominant cost of every planner (reference: tree_search/deterministic.py:28-43).

Here an environment is a pure function pair over pytrees:

    reset(params, key)               -> (state, obs)
    step(params, state, action, key) -> (state, obs, reward, terminated, truncated, info)

"Forking" a simulation is carrying the state value; ``jax.vmap`` gives
thousands of lockstep copies for free, and ``lax.scan`` rolls trajectories
inside one XLA program. A thin stateful ``EnvHandle`` adapts the pure core to
the object-style harness/agent API (act/record loops, seeding protocol).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Spaces
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Discrete:
    n: int

    def sample(self, key):
        return jax.random.randint(key, (), 0, self.n)

    @property
    def shape(self):
        return ()


@dataclasses.dataclass(frozen=True)
class TupleSpace:
    """Product space for multi-agent tuple observations/actions
    (reference: gym spaces.Tuple in MultiAgentObservation configs)."""
    spaces: Tuple[Any, ...]

    def sample(self, key):
        keys = jax.random.split(key, len(self.spaces))
        return tuple(s.sample(k) for s, k in zip(self.spaces, keys))

    def __len__(self):
        return len(self.spaces)


@dataclasses.dataclass(frozen=True)
class Box:
    low: Any
    high: Any
    shape: Tuple[int, ...]

    def sample(self, key):
        low = jnp.nan_to_num(jnp.asarray(self.low, jnp.float32), neginf=-1e3)
        high = jnp.nan_to_num(jnp.asarray(self.high, jnp.float32), posinf=1e3)
        return jax.random.uniform(key, self.shape, minval=low, maxval=high)


# ---------------------------------------------------------------------------
# Step output
# ---------------------------------------------------------------------------

class StepOut(NamedTuple):
    """The single, clean step signature of this framework.

    (The reference mixes 4- and 5-tuple step returns across planners after the
    gymnasium migration, SURVEY §7 hard-part 4; we define exactly one.)
    """

    state: Any
    obs: Any
    reward: Any
    terminated: Any
    truncated: Any
    info: Dict[str, Any]

    @property
    def done(self):
        return jnp.logical_or(self.terminated, self.truncated)


@dataclasses.dataclass(frozen=True)
class EnvSpec:
    id: str
    max_episode_steps: int | None = None


# ---------------------------------------------------------------------------
# Functional environment definition
# ---------------------------------------------------------------------------

class FunctionalEnv:
    """Static environment definition (hashable; safe as a jit static arg).

    Subclasses implement ``reset`` and ``step`` as pure jnp functions of a
    params pytree. The instance holds only static structure (sizes, spaces).
    """

    spec: EnvSpec = EnvSpec("functional-env")

    # True when ``transition`` consumes its PRNG key. Deterministic envs set
    # this False so batched planners can skip per-step key splitting (one
    # threefry op per sequential step on the hot path).
    transition_uses_key: bool = True

    def default_params(self):
        raise NotImplementedError

    def reset(self, params, key) -> Tuple[Any, Any]:
        raise NotImplementedError

    def step(self, params, state, action, key) -> StepOut:
        raise NotImplementedError

    def observe(self, params, state):
        """Observation of a state (pure; default: envs override)."""
        raise NotImplementedError

    def transition(self, params, state, action, key) -> StepOut:
        """Like ``step`` but exempt from producing a real observation —
        open-loop planners (OPD, MCTS rollouts, CEM) never read it, and for
        envs with expensive observations (highway's sorted kinematics) an
        override that skips ``observe`` removes that cost from the planning
        hot path. Default: full step."""
        return self.step(params, state, action, key)

    # -- static structure ---------------------------------------------------
    @property
    def action_space(self) -> Discrete | Box:
        raise NotImplementedError

    @property
    def observation_space(self) -> Discrete | Box:
        raise NotImplementedError

    # -- derived conveniences ----------------------------------------------
    def rollout(self, params, state, actions, key) -> StepOut:
        """Roll a sequence of actions with ``lax.scan``; outputs are stacked."""

        def body(carry, action):
            state, key = carry
            key, sub = jax.random.split(key)
            out = self.step(params, state, action, sub)
            return (out.state, key), out

        (_, _), outs = jax.lax.scan(body, (state, key), actions)
        return outs

    def preprocess(self, name: str, args) -> "FunctionalEnv":
        """Named env preprocessors (reference: factory.py:97-116). Functional
        envs that support planning simplifications override this."""
        raise ValueError(f"{type(self).__name__} has no preprocessor {name!r}")

    def __hash__(self):
        return hash((type(self), tuple(sorted(self.__dict__.items(), key=lambda kv: kv[0]))))

    def __eq__(self, other):
        return type(self) is type(other) and self.__dict__ == other.__dict__


# ---------------------------------------------------------------------------
# Stateful handle (harness/object API adapter)
# ---------------------------------------------------------------------------

class EnvHandle:
    """Gym-style stateful adapter over a functional env.

    Used by the evaluation harness and by object-path agents. Forking the
    handle (the reference's ``safe_deepcopy_env``) is O(1): it stamps the
    immutable state pytree into a new handle.
    """

    def __init__(self, env: FunctionalEnv, params=None, config: Dict | None = None):
        self.functional = env
        self.params = params if params is not None else env.default_params()
        self.config = dict(config or {})
        self.state = None
        self.obs = None
        self.key = jax.random.PRNGKey(0)
        self.done = False
        self._np_random = np.random.default_rng()
        self._jit_step = jax.jit(env.step)
        self._jit_reset = jax.jit(env.reset)
        # the reference's load_environment resets envs on creation
        # (factory.py:59-94); planners rely on a live state pytree
        self.reset(seed=self.config.get("seed"))

    # -- gym-ish API --------------------------------------------------------
    @property
    def spec(self):
        return self.functional.spec

    @property
    def unwrapped(self):
        return self

    @property
    def action_space(self):
        return self.functional.action_space

    @property
    def observation_space(self):
        return self.functional.observation_space

    def get_available_actions(self):
        """Discrete action ids at the current state (the reference's planners
        call this on env copies, e.g. mcts_dpw.py:119-126)."""
        space = self.functional.action_space
        if hasattr(space, "spaces"):  # multi-agent: one agent's discrete set
            space = space.spaces[0]
        return list(range(space.n))

    def seed(self, seed: int | None = None):
        if seed is not None:
            self.key = jax.random.PRNGKey(seed)
            self._np_random = np.random.default_rng(seed)
        return [seed]

    def reset(self, seed: int | None = None, **kwargs):
        if seed is not None:
            self.seed(seed)
        self.key, sub = jax.random.split(self.key)
        self.state, obs = self._jit_reset(self.params, sub)
        self.obs = obs
        self.done = False
        return jax.tree.map(np.asarray, obs), {}

    def step(self, action):
        self.key, sub = jax.random.split(self.key)
        out = self._jit_step(self.params, self.state, jnp.asarray(action), sub)
        self.state = out.state
        self.obs = out.obs
        self.done = bool(out.terminated) or bool(out.truncated)
        info = {k: np.asarray(v) for k, v in out.info.items()}
        return (jax.tree.map(np.asarray, out.obs), float(out.reward),
                bool(out.terminated), bool(out.truncated), info)

    def to_finite_mdp(self):
        """Finite-MDP view around the current state, for envs whose
        functional core supports the conversion (the reference calls
        env.to_finite_mdp() the same way; value_iteration.py:29-35)."""
        fn = getattr(self.functional, "to_finite_mdp", None)
        if fn is None:
            raise TypeError(
                f"{type(self.functional).__name__} has no finite-MDP view")
        return fn(self.params, self.state)

    def render(self):
        return None

    def close(self):
        pass

    def fork(self) -> "EnvHandle":
        new = EnvHandle.__new__(EnvHandle)
        new.__dict__.update(self.__dict__)
        new._np_random = np.random.default_rng(self._np_random.integers(2**63))
        return new

    def preprocess(self, name, args):
        new = self.fork()
        try:
            result = self.functional.preprocess(name, args)
        except ValueError:
            return new
        if isinstance(result, tuple):
            new.functional, transform = result
            if self.state is not None:
                new.params, new.state = transform(self.params, self.state)
            if new.state is not None:
                new.obs = new.functional.observe(new.params, new.state)
        else:
            new.functional = result
        new._jit_step = jax.jit(new.functional.step)
        new._jit_reset = jax.jit(new.functional.reset)
        return new


# ---------------------------------------------------------------------------
# Vectorised helpers for planners / actor loops
# ---------------------------------------------------------------------------

def vector_step(env: FunctionalEnv):
    """Batched step over a leading batch axis of states/actions/keys."""
    return jax.vmap(env.step, in_axes=(None, 0, 0, 0))


def vector_reset(env: FunctionalEnv):
    return jax.vmap(env.reset, in_axes=(None, 0))


@partial(jax.jit, static_argnames=("env", "policy", "horizon"))
def policy_rollout(env: FunctionalEnv, policy: Callable, params, state, key, horizon: int):
    """Roll ``policy(obs, key) -> action`` for ``horizon`` steps under scan.

    Returns stacked StepOut; steps after termination are masked by carrying a
    ``live`` flag (rewards post-done are zeroed).
    """

    def body(carry, _):
        state, obs, live, key = carry
        key, ka, ks = jax.random.split(key, 3)
        action = policy(obs, ka)
        out = env.step(params, state, action, ks)
        reward = jnp.where(live, out.reward, 0.0)
        next_live = live & ~out.done
        return (out.state, out.obs, next_live, key), out._replace(reward=reward)

    obs0 = env.observe(params, state)
    init = (state, obs0, jnp.asarray(True), key)
    _, outs = jax.lax.scan(body, init, None, length=horizon)
    return outs
