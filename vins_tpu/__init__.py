"""vins_tpu — a TPU-native monocular visual-inertial odometry / SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
HKUST-Aerial-Robotics/VINS-Mobile (see SURVEY.md): KLT front-end, IMU
preintegration, sliding-window bundle adjustment with marginalization,
visual-inertial initialization, motion-only high-rate tracking, loop
closure with a 4-DoF pose graph, and distributed BA over a device mesh.
"""

import jax as _jax

# The estimator is small-matrix nonlinear least squares, not NN matmuls:
# TPU's default bf16 MXU passes destroy the conditioned linear systems
# (visual-inertial alignment verifiably fails). Force full fp32 matmuls.
_jax.config.update("jax_default_matmul_precision", "highest")

from .config import (VinsConfig, CameraConfig, ImuConfig, SolverConfig,
                     FrontendConfig, LoopConfig, WindowConfig, MeshConfig,
                     default_config, euroc_config)

__version__ = "0.1.0"
__all__ = [
    "VinsConfig", "CameraConfig", "ImuConfig", "SolverConfig",
    "FrontendConfig", "LoopConfig", "WindowConfig", "MeshConfig",
    "default_config", "euroc_config",
]
