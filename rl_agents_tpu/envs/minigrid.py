"""Functional MiniGrid surrogates for the GridWorld planning study.

The reference's GridWorld configs (scripts/configs/GridWorld/*.json) run
planners on ``gym_minigrid`` environments: ``MiniGrid-Empty-16x16-v0`` (reach
the goal corner) and the study fork's ``MiniGrid-Collect[-Stochastic]-9x9-v0``
(collect scattered items; the stochastic variant perturbs moves) — the
substrates of the state-aware planning experiments. gym_minigrid is a python
object-grid simulator; these surrogates express the same decision problems as
pure jnp programs so the whole GridWorld corpus (OPD, state-aware, UCT, OLOP
family) runs functionally:

* agent state: position (2,) + facing direction (4-way) + collected mask;
* actions: MiniGrid's movement triple [turn left, turn right, forward];
* observation: a compact full-obs vector [x, y, dir one-hot, collected mask]
  — the hashable state signature the obs-keyed planners aggregate on (the
  reference planners hash the env observation the same way);
* Empty reward: ``1 - 0.9 * t / max_steps`` on reaching the goal (MiniGrid's
  _reward), terminal; Collect reward: +1 per item stepped on, terminal when
  all are collected; Stochastic: with probability ``stochasticity`` the
  commanded action is dropped (the same noise model as GridEnv,
  reference: utils/envs/gridenv.py:27-29).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.envs.base import Box, Discrete, EnvHandle, EnvSpec, FunctionalEnv, StepOut

TURN_LEFT, TURN_RIGHT, FORWARD = 0, 1, 2
# direction -> displacement (MiniGrid: 0 right, 1 down, 2 left, 3 up)
_DIR_VEC = jnp.array([[1, 0], [0, 1], [-1, 0], [0, -1]], jnp.int32)


class MiniGridState(NamedTuple):
    pos: Any        # (2,) i32 cell
    dir: Any        # [] i32 facing
    collected: Any  # [K] bool (K=1 dummy for Empty)
    t: Any


class MiniGridEnv(FunctionalEnv):
    def __init__(self, size: int = 16, task: str = "empty", items: int = 4,
                 stochasticity: float = 0.0, max_episode_steps: int = 100,
                 seed: int = 0):
        if task not in ("empty", "collect"):
            raise ValueError(f"Unknown task {task}")
        self.size = size
        self.task = task
        self.items = items if task == "collect" else 1
        self.stochasticity = stochasticity
        self.max_episode_steps = max_episode_steps
        self.spec = EnvSpec(f"minigrid-{task}", max_episode_steps)
        # item layout is static structure (seeded once, like the study fork's
        # fixed-seed grids); kept as a plain tuple — env instances are jit
        # static args and must stay hashable (envs/base.py __hash__)
        rng = np.random.default_rng(seed)
        cells = rng.choice((size - 2) * (size - 2), size=self.items, replace=False)
        self._item_cells = tuple(
            (int(1 + c % (size - 2)), int(1 + c // (size - 2))) for c in cells)

    @property
    def action_space(self):
        return Discrete(3)

    @property
    def observation_space(self):
        return Box(0.0, 1.0, (2 + 4 + self.items,))

    def default_params(self):
        return {"stochasticity": jnp.float32(self.stochasticity),
                "items": jnp.asarray(self._item_cells, jnp.int32)}

    def reset(self, params, key):
        state = MiniGridState(pos=jnp.array([1, 1], jnp.int32),
                              dir=jnp.zeros((), jnp.int32),
                              collected=jnp.zeros((self.items,), bool),
                              t=jnp.zeros((), jnp.int32))
        return state, self.observe(params, state)

    def observe(self, params, state: MiniGridState):
        S = float(self.size)
        return jnp.concatenate([
            state.pos.astype(jnp.float32) / S,
            (state.dir == jnp.arange(4)).astype(jnp.float32),
            state.collected.astype(jnp.float32),
        ])

    def step(self, params, state: MiniGridState, action, key) -> StepOut:
        # stochastic action drop (reference: gridenv.py:27-29 noise model)
        drop = jax.random.uniform(key) < params["stochasticity"]
        act = jnp.where(drop, -1, action)

        new_dir = (state.dir + jnp.where(act == TURN_RIGHT, 1, 0)
                   + jnp.where(act == TURN_LEFT, 3, 0)) % 4
        fwd = state.pos + jnp.sum(
            jnp.where((jnp.arange(4) == new_dir)[:, None], _DIR_VEC, 0), axis=0)
        fwd = jnp.clip(fwd, 1, self.size - 2)  # walls
        pos = jnp.where(act == FORWARD, fwd, state.pos)
        t = state.t + 1

        if self.task == "empty":
            goal = jnp.array([self.size - 2, self.size - 2], jnp.int32)
            done = jnp.all(pos == goal)
            reward = jnp.where(
                done, 1.0 - 0.9 * t.astype(jnp.float32) / self.max_episode_steps, 0.0)
            collected = state.collected
        else:
            on_item = jnp.all(pos[None, :] == params["items"], axis=1)
            newly = on_item & ~state.collected
            reward = jnp.sum(newly.astype(jnp.float32))
            collected = state.collected | on_item
            done = jnp.all(collected)

        new_state = MiniGridState(pos=pos, dir=new_dir, collected=collected, t=t)
        return StepOut(new_state, self.observe(params, new_state), reward,
                       done, t >= self.max_episode_steps, {})


def make(config: dict | None = None) -> EnvHandle:
    """Build from a reference GridWorld config: the MiniGrid id encodes the
    task and grid size (e.g. ``MiniGrid-Collect-Stochastic-9x9-v0``)."""
    config = dict(config or {})
    env_id = config.get("id", "MiniGrid-Empty-16x16-v0")
    parts = env_id.split("-")
    task = "collect" if "Collect" in parts else "empty"
    size = next((int(p.split("x")[0]) for p in parts if "x" in p and
                 p.split("x")[0].isdigit()), 16)
    stochasticity = config.get(
        "stochasticity", 0.1 if "Stochastic" in parts else 0.0)
    env = MiniGridEnv(size=size, task=task,
                      items=config.get("items", 4),
                      stochasticity=stochasticity,
                      max_episode_steps=config.get("max_episode_steps", 4 * size * size),
                      seed=config.get("seed", 0))
    return EnvHandle(env, env.default_params(), config)
