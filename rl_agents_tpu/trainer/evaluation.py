"""Evaluation harness: the generic agent/environment interaction loop.

Rebuild of the reference trainer (rl_agents/trainer/evaluation.py:23-387):
train/test episode loops, the seeding protocol (sim_seed + episode), run
metadata/logging, TensorBoard scalars, checkpoint cadence (cubic schedule +
best-EMA window), and batched collection for fitted agents.

TPU-native differences: batched sample collection runs as one on-device
vmapped actor program when the agent provides ``collect_samples_device``
(replacing the reference's multiprocessing.Pool worker respawn,
evaluation.py:196-290); model weights stay in device memory — no model-file
parameter channel between collection and update.
"""
from __future__ import annotations

import datetime
import json
import logging
import os
import time
from pathlib import Path
from typing import Callable, List, NamedTuple, Optional

import numpy as np

import rl_agents_tpu.trainer.logger
from rl_agents_tpu.configuration import serialize
from rl_agents_tpu.utils.math import near_split

logger = logging.getLogger(__name__)


class Transition(NamedTuple):
    state: object
    action: object
    reward: object
    next_state: object
    terminal: object
    info: dict


def capped_cubic_video_schedule(episode: int) -> bool:
    """True on perfect cubes below 1000, then every 1000 episodes."""
    if episode < 1000:
        return int(round(episode ** (1.0 / 3))) ** 3 == episode
    return episode % 1000 == 0


class Evaluation:
    OUTPUT_FOLDER = "out"
    SAVED_MODELS_FOLDER = "saved_models"
    RUN_FOLDER = "run_{}_{}"
    METADATA_FILE = "metadata.{}.json"
    LOGGING_FILE = "logging.{}.log"

    def __init__(self,
                 env,
                 agent,
                 directory=None,
                 run_directory=None,
                 num_episodes: int = 1000,
                 training: bool = True,
                 sim_seed: Optional[int] = None,
                 recover=None,
                 display_env: bool = False,
                 display_agent: bool = False,
                 display_rewards: bool = False,
                 close_env: bool = True,
                 step_callback_fn: Optional[Callable] = None):
        self.env = env
        self.agent = agent
        self.num_episodes = num_episodes
        self.training = training
        self.sim_seed = sim_seed if sim_seed is not None else int(np.random.randint(0, 1_000_000))
        self.close_env = close_env
        self.display_env = display_env
        self.step_callback_fn = step_callback_fn

        self.directory = Path(directory or self.default_directory)
        self.run_directory = self.directory / (run_directory or self.default_run_directory)
        self.run_directory.mkdir(parents=True, exist_ok=True)
        self.episode = 0
        self.writer = self._make_writer()
        self.agent.set_writer(self.writer)
        self.agent.set_directory(self.run_directory)
        self.agent.evaluation = self
        self.write_logging()
        self.write_metadata()
        self.filtered_agent_stats = 0.0
        self.best_agent_stats = (-np.inf, 0)
        self.episode_rewards: List[float] = []

        self.recover = recover
        if self.recover:
            self.load_agent_model(self.recover)

        self.reward_viewer = None
        if display_rewards:
            from rl_agents_tpu.trainer.graphics import RewardViewer

            self.reward_viewer = RewardViewer()
        self.recorder = None
        if display_env:
            from rl_agents_tpu.graphics.render import EpisodeRecorder, renderer_for

            if renderer_for(self.env) is not None:
                self.recorder = EpisodeRecorder(self.run_directory)
        # Live pygame viewer with agent overlays (reference: evaluation.py:100-109
        # hooks AgentGraphics.display into env.viewer.set_agent_display).
        self.viewer = None
        if display_env and hasattr(self.env, "functional"):
            try:
                from rl_agents_tpu.graphics.pygame_viewer import (
                    PygameViewer, default_agent_display)

                self.viewer = PygameViewer(self.env)
                if display_agent:
                    self.viewer.set_agent_display(
                        lambda agent_surface, sim_surface: default_agent_display(
                            self.agent, agent_surface, sim_surface))
            except ImportError:
                logger.warning("pygame unavailable; live viewer disabled")
        self.observation = None

    def _make_writer(self):
        try:
            from tensorboardX import SummaryWriter

            return SummaryWriter(str(self.run_directory))
        except ImportError:  # metrics degrade gracefully
            from rl_agents_tpu.trainer.metrics import NullWriter

            return NullWriter()

    # ------------------------------------------------------------------
    # Top-level modes
    # ------------------------------------------------------------------
    def train(self):
        self.training = True
        if self.agent.config.get("fused") and hasattr(self.agent, "train_fused") \
                and hasattr(self.env, "functional"):
            self.run_fused_training()
        elif getattr(self.agent, "batched", False):
            self.run_batched_episodes()
        else:
            self.run_episodes()
        self.close()

    def run_fused_training(self):
        """Whole-run fused actor-learner training (agent config
        ``"fused": true``): the agent trains as one on-device program
        (parallel/actor_learner.py — the TPU replacement for the reference's
        per-step record loop AND its worker-pool collection,
        evaluation.py:163-290), then the trained agent is checkpointed."""
        logger.info("Fused on-device training: %d episode-equivalents",
                    self.num_episodes)
        ema = self.agent.train_fused(self.env, self.num_episodes,
                                     writer=self.writer)
        logger.info("Fused training done: EMA completed-episode return %.1f", ema)
        # close() writes the "final" checkpoint (reference: evaluation.py:378-387)

    def test(self):
        self.training = False
        try:
            self.agent.eval()
        except AttributeError:
            pass
        self.run_episodes()
        self.close()

    # ------------------------------------------------------------------
    # Episode loops
    # ------------------------------------------------------------------
    def run_episodes(self):
        for self.episode in range(self.num_episodes):
            terminal = False
            self.reset(seed=self.episode)
            record = self.recorder is not None and (
                not self.training or capped_cubic_video_schedule(self.episode))
            rewards = []
            start_time = time.time()
            while not terminal:
                reward, terminal = self.step()
                rewards.append(reward)
                if record:
                    self.recorder.capture(self.env)
            duration = time.time() - start_time
            if record:
                self.recorder.save(self.episode)
            self.after_all_episodes(self.episode, rewards, duration)
            self.after_some_episodes(self.episode, rewards)

    def step(self):
        """plan -> env.step -> record (reference: evaluation.py:163-194)."""
        actions = self.agent.plan(self.observation)
        if actions is None or (hasattr(actions, "__len__") and len(actions) == 0):
            raise Exception("The agent did not plan any action")

        previous_observation, action = self.observation, actions[0]
        self.observation, reward, done, truncated, info = self.env.step(action)
        terminal = bool(done) or bool(truncated)

        if self.step_callback_fn is not None:
            self.step_callback_fn(self.episode, self.env, self.agent,
                                  (previous_observation, action, reward, self.observation,
                                   done, truncated, info), self.writer)
        try:
            self.agent.record(previous_observation, action, reward, self.observation, done, info)
        except NotImplementedError:
            pass
        if self.viewer is not None:
            self.viewer.display(agent=self.agent)
        return float(reward), terminal

    # ------------------------------------------------------------------
    # Batched collection (fitted agents: FTQ / BFTQ)
    # ------------------------------------------------------------------
    def run_batched_episodes(self):
        """Alternate sample-collection and model fitting
        (reference: evaluation.py:196-246). Collection runs on-device when the
        agent supports it; otherwise a sequential host loop replaces the
        reference's process pool (single program, no serialize/respawn)."""
        episode = 0
        episode_duration = 14
        batch_sizes = near_split(self.num_episodes * episode_duration,
                                 size_bins=self.agent.config["batch_size"])
        self.agent.reset()
        for batch, batch_size in enumerate(batch_sizes):
            logger.info("[BATCH=%d/%d] collecting %d samples", batch + 1, len(batch_sizes), batch_size)
            collect_start = time.time()
            if hasattr(self.agent, "collect_samples_device"):
                trajectories = self.agent.collect_samples_device(
                    self.env, batch_size, seed=batch, explore=(batch == 0))
            else:
                trajectories = self.collect_samples_host(batch_size, seed=batch, batch=batch)
            # Real wall-clock fps (reference times each trajectory individually,
            # evaluation.py:145-159,331): collection here is one timed batch, so
            # each episode is attributed its share of the batch duration
            # proportional to its step count — episode fps == batch fps.
            collect_duration = time.time() - collect_start
            total_steps = sum(len(t) for t in trajectories) or 1
            for trajectory in trajectories:
                if trajectory and trajectory[-1].terminal:
                    self.after_all_episodes(
                        episode, [t.reward for t in trajectory],
                        duration=collect_duration * len(trajectory) / total_steps)
                episode += 1
                for t in trajectory:
                    self.agent.record(*t)
            self.agent.update()

    def collect_samples_host(self, count: int, seed: int, batch: int):
        """Sequential host-side sample collection with the training agent
        (the reference reconstructs agents in worker processes and forces pure
        exploration on batch 0, evaluation.py:248-290)."""
        env = self.env
        agent = self.agent
        if batch == 0 and hasattr(agent, "explore"):
            agent.explore(True)
        agent.seed(seed)
        state, _ = env.reset(seed=seed)
        episodes, trajectory = [], []
        for _ in range(count):
            action = agent.act(state)
            next_state, reward, done, truncated, info = env.step(action)
            terminal = bool(done) or bool(truncated)
            trajectory.append(Transition(state, action, reward, next_state, terminal, info))
            if terminal:
                state, _ = env.reset()
                episodes.append(trajectory)
                trajectory = []
            else:
                state = next_state
        if trajectory:
            episodes.append(trajectory)
        if batch == 0 and hasattr(agent, "explore"):
            agent.explore(False)
        return episodes

    # ------------------------------------------------------------------
    # Checkpointing
    # ------------------------------------------------------------------
    def save_agent_model(self, identifier, do_save: bool = True):
        permanent_folder = self.directory / self.SAVED_MODELS_FOLDER
        os.makedirs(permanent_folder, exist_ok=True)
        episode_path = None
        if do_save:
            episode_path = Path(self.run_directory) / f"checkpoint-{identifier}.tar"
            try:
                self.agent.save(filename=permanent_folder / "latest.tar")
                episode_path = self.agent.save(filename=episode_path)
                if episode_path:
                    logger.info("Saved %s model to %s", self.agent.__class__.__name__, episode_path)
            except NotImplementedError:
                pass
        return episode_path

    def load_agent_model(self, model_path):
        if model_path is True:
            model_path = self.directory / self.SAVED_MODELS_FOLDER / "latest.tar"
        if isinstance(model_path, str):
            model_path = Path(model_path)
            if not model_path.exists():
                model_path = self.directory / self.SAVED_MODELS_FOLDER / model_path
        try:
            model_path = self.agent.load(filename=model_path)
            if model_path:
                logger.info("Loaded %s model from %s", self.agent.__class__.__name__, model_path)
        except FileNotFoundError:
            logger.warning("No pre-trained model found at the desired location.")
        except NotImplementedError:
            pass

    # ------------------------------------------------------------------
    # Metrics / cadence
    # ------------------------------------------------------------------
    def after_all_episodes(self, episode: int, rewards: List[float], duration: float):
        rewards = np.array(rewards)
        gamma = self.agent.config.get("gamma", 1)
        self.writer.add_scalar("episode/length", len(rewards), episode)
        self.writer.add_scalar("episode/total_reward", float(np.sum(rewards)), episode)
        self.writer.add_scalar("episode/return",
                               float(sum(r * gamma ** t for t, r in enumerate(rewards))), episode)
        self.writer.add_scalar("episode/fps", len(rewards) / max(duration, 1e-6), episode)
        try:
            self.writer.add_histogram("episode/rewards", rewards, episode)
        except (AttributeError, ValueError):
            pass
        self.episode_rewards.append(float(np.sum(rewards)))
        if self.reward_viewer:
            self.reward_viewer.update(float(np.sum(rewards)))
        logger.info("Episode %d score: %.1f", episode, float(np.sum(rewards)))

    def after_some_episodes(self, episode: int, rewards,
                            best_increase: float = 1.1, episodes_window: int = 50):
        if capped_cubic_video_schedule(episode):
            if self.training:
                self.save_agent_model(episode)
        if self.training:
            best_reward, best_episode = self.best_agent_stats
            self.filtered_agent_stats += 1 / episodes_window * (np.sum(rewards) - self.filtered_agent_stats)
            if self.filtered_agent_stats > best_increase * best_reward \
                    and episode >= best_episode + episodes_window:
                self.best_agent_stats = (self.filtered_agent_stats, episode)
                self.save_agent_model("best")

    # ------------------------------------------------------------------
    # Bookkeeping
    # ------------------------------------------------------------------
    @property
    def default_directory(self) -> Path:
        spec = getattr(self.env, "spec", None)
        if spec is not None and getattr(spec, "id", None):
            env_name = spec.id
        else:
            env_name = type(getattr(self.env, "unwrapped", self.env)).__name__
        return Path(self.OUTPUT_FOLDER) / env_name / self.agent.__class__.__name__

    @property
    def default_run_directory(self) -> str:
        return self.RUN_FOLDER.format(datetime.datetime.now().strftime("%Y%m%d-%H%M%S"), os.getpid())

    def write_metadata(self):
        metadata = dict(env=serialize(self.env), agent=serialize(self.agent))
        file_infix = f"{id(self.env)}.{os.getpid()}"
        file = self.run_directory / self.METADATA_FILE.format(file_infix)
        with file.open("w") as f:
            json.dump(metadata, f, sort_keys=True, indent=4, default=repr)

    def write_logging(self):
        file_infix = f"{id(self.env)}.{os.getpid()}"
        rl_agents_tpu.trainer.logger.configure()
        rl_agents_tpu.trainer.logger.add_file_handler(
            self.run_directory / self.LOGGING_FILE.format(file_infix))

    def reset(self, seed: int = 0):
        """Seeding protocol (reference: evaluation.py:372-376): env reset with
        the episode seed; agent seeded with sim_seed + episode."""
        seed = self.sim_seed + seed
        self.observation, _ = self.env.reset(seed=seed)
        self.agent.seed(seed)
        self.agent.reset()

    def close(self):
        if self.training:
            self.save_agent_model("final")
        self.writer.close()
        if self.viewer is not None:
            self.viewer.close()
        if self.close_env:
            self.env.close()
