"""move2hear_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for active
audio-visual source separation, with the capabilities of Move2Hear
(SAGNIKMJR/move2hear-active-AV-separation, ICCV-21).

The importable package name uses underscores (`move2hear_tpu`) because the
project name `move2hear-active-AV-separation_tpu` is not a legal Python
identifier.

Layout:
  ops/       pure audio kernels: STFT/ISTFT, RIR fft-convolution, spectrogram
             helpers, the 16-way frequency-slice layout transform, and the
             fused TPU audio frontend (Pallas + XLA paths)
  models/    flax modules: separator U-Nets, audio/visual CNNs, acoustic
             memory, GRU state encoder, the Move2Hear policy
  rl/        PPO losses, GAE, device-resident rollout storage, the RL trainer
  parallel/  mesh construction, DDPPO-over-ICI collectives, preemptive sync
  env/       grid-graph simulator, audio DB, AAViSS task semantics, vectorized
             environments, synthetic micro-scene fixtures
  pretrain/  passive separator supervised pretraining pipeline
  eval/      STFT-L2 / BSS-eval (SI-SDR family) metrics, checkpoint-polling
             evaluator, switch-policy eval
  utils/     config tree, registry, checkpointing, logging
"""

__version__ = "0.1.0"
