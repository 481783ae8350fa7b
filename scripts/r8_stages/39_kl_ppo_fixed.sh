# kl_ppo FIXED at full flagship budget (VERDICT item 2, strongest closure):
# identical recipe to the r5/r8 plateau runs except
# kl_beta_interval=iteration (Schulman 2017 beta semantics — the probe
# measured this variant reaching reward -30.9 at 7.0M frames, more
# sample-efficient than TRPL's -30 @ 10.8M, where the per-minibatch
# controller froze at -104 / 0.0% success). 20.48M frames + deterministic
# eval -> the ALGO_COMPARISON "kl_ppo (fixed)" row.
r8_train_eval kl_ppo_fixed rigid_insertion_multi_hepi_trpl 5400 0.1 \
  env.num_envs=1024 env.kwargs.warmup_steps=0 collector.frames_per_batch=102400 \
  collector.total_frames=20480000 algo=kl_ppo \
  algorithm.policy.minimal_std=0.05 \
  algorithm.objective.clip_grad_norm=true \
  algorithm.objective.kl_beta_interval=iteration
