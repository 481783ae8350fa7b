# kl_ppo FIXED, second seed (round-5 VERDICT item 6): the "most
# sample-efficient family" claim in ALGO_COMPARISON/MIGRATION is n=1
# (seed 0: 100.00% success). Same recipe as 39_kl_ppo_fixed, seed 2.
r8_train_eval kl_ppo_seed2 rigid_insertion_multi_hepi_trpl 5400 0.1 \
  env.num_envs=1024 env.kwargs.warmup_steps=0 collector.frames_per_batch=102400 \
  collector.total_frames=20480000 algo=kl_ppo \
  algorithm.policy.minimal_std=0.05 \
  algorithm.objective.clip_grad_norm=true \
  algorithm.objective.kl_beta_interval=iteration \
  seed=2
