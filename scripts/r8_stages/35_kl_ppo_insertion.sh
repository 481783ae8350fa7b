# instrumented kl_ppo flagship rerun (VERDICT item 2): same recipe as the
# -98-plateau run but now logging beta mean/max, policy_std/min, actor grad
# norms every iteration for the root-cause analysis.
r8_train_eval kl_ppo_insertion rigid_insertion_multi_hepi_trpl 5400 0.1 \
  env.num_envs=1024 env.kwargs.warmup_steps=0 collector.frames_per_batch=102400 \
  collector.total_frames=20480000 algo=kl_ppo
