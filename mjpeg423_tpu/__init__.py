"""mjpeg423_tpu — TPU-native MJPEG423 video decode/encode framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
dual-core Nios-II MJPEG423 player (ghananigans/mjpeg423-video-decoder-software):
the complete bit-exact codec, a stage-decoupled decode pipeline, GOP-sharded
and sequence-parallel multi-chip execution, playback control (play/seek/FF/RW)
and a native C entropy codec for the serial host-side bit parsing.

Layers (bottom-up):
  core/      container format, tables, config        (ref L2/L3 analogs)
  ops/       entropy + transform kernels: NumPy oracle, JAX, Pallas
  native/    C entropy codec (the hot host-side op)
  codec/     end-to-end encoder/decoder APIs          (ref 2.1e/2.1j)
  parallel/  mesh / GOP sharding / temporal scan      (ref §2 parallelism)
  runtime/   pipeline, playback orchestrator, metrics (ref 2.5/2.7/2.13)
  io/        BMP + stream readers                     (ref 2.2/2.14)
"""

__version__ = "0.1.0"
