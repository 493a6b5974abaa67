"""vins_tpu — a TPU-native monocular visual-inertial odometry / SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
HKUST-Aerial-Robotics/VINS-Mobile (see SURVEY.md): KLT front-end, IMU
preintegration, sliding-window bundle adjustment with marginalization,
visual-inertial initialization, motion-only high-rate tracking, loop
closure with a 4-DoF pose graph, and distributed BA over a device mesh.
"""

import os as _os

import jax as _jax

# The estimator is small-matrix nonlinear least squares, not NN matmuls:
# TPU's default bf16 MXU passes destroy the conditioned linear systems
# (visual-inertial alignment verifiably fails). Force full fp32 matmuls.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache: the full system compiles ~a dozen
# distinct programs (frontend init/track, boot, backend, pnp, loop
# kernels); on a remote-compile TPU backend the first run pays tens of
# seconds per program. Cache survives across processes so replay runs,
# benchmarks, and the examples start hot. Override/disable with
# VINS_TPU_CACHE (empty string disables).
_cache_dir = _os.environ.get(
    "VINS_TPU_CACHE",
    _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), ".xla_cache"))
if _cache_dir:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from .config import (VinsConfig, CameraConfig, ImuConfig, SolverConfig,
                     FrontendConfig, LoopConfig, WindowConfig, MeshConfig,
                     default_config, euroc_config)

__version__ = "0.1.0"
__all__ = [
    "VinsConfig", "CameraConfig", "ImuConfig", "SolverConfig",
    "FrontendConfig", "LoopConfig", "WindowConfig", "MeshConfig",
    "default_config", "euroc_config",
]
