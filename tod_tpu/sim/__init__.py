"""Closed-loop drive-to-ball simulation: world, renderer, controller, loop.

The consumer side of the product (the reference's RoboRIO lived off-repo):
a metric world + a fusion-consistent RGB-D renderer + a follower that
executes served signed-turn Paths, so "the robot reaches the ball" is a
tested property of the framework (tests/test_sim.py).
"""

from tod_tpu.sim.camera import render
from tod_tpu.sim.controller import DirectionFollower
from tod_tpu.sim.loop import run_closed_loop
from tod_tpu.sim.world import Ball, Obstacle, SimWorld

__all__ = [
    "Ball",
    "DirectionFollower",
    "Obstacle",
    "SimWorld",
    "render",
    "run_closed_loop",
]
