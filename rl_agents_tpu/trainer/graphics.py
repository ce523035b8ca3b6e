"""Live reward viewer (rebuild of reference rl_agents/trainer/graphics.py:8-28)."""
from __future__ import annotations

import numpy as np


class RewardViewer:
    def __init__(self):
        self.rewards = []

    def update(self, reward: float):
        self.rewards.append(reward)
        self.display()

    def display(self):
        try:
            import matplotlib.pyplot as plt
        except ImportError:
            return
        plt.figure(num="Rewards")
        plt.clf()
        plt.title("Total reward")
        plt.xlabel("Episode")
        plt.ylabel("Reward")
        plt.plot(self.rewards)
        means = np.convolve(self.rewards, np.ones(min(len(self.rewards), 30)) / 30, mode="valid")
        plt.plot(np.arange(len(means)), means)
        plt.pause(0.001)
