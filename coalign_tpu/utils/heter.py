"""Heterogeneous-modality agent assignment.

TPU-first rework of ref opencood/utils/heter_utils.py:10 (AgentSelector):
deterministically assigns each agent a sensing modality (lidar / camera)
per the configured ego modality + assignment ratio, seeded for
reproducibility across train/eval runs.
"""

from __future__ import annotations

import numpy as np


class AgentSelector:
    def __init__(self, lidar_ratio: float = 0.5,
                 ego_modality: str = "lidar", seed: int = 303):
        self.lidar_ratio = lidar_ratio
        self.ego_modality = ego_modality
        self.rng = np.random.default_rng(seed)

    def select(self, num_agents: int):
        """Returns a list of 'lidar' / 'camera' per agent, ego first."""
        mods = ["lidar" if self.rng.random() < self.lidar_ratio
                else "camera" for _ in range(num_agents)]
        if num_agents:
            mods[0] = self.ego_modality
        return mods
