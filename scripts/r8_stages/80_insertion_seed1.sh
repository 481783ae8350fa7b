# multi-seed error bars (VERDICT item 4): insertion flagship seed 1
r8_train_eval insertion_seed1 rigid_insertion_multi_hepi_trpl 5400 0.1 \
  env.num_envs=1024 env.kwargs.warmup_steps=0 collector.frames_per_batch=102400 \
  collector.total_frames=20480000 seed=1
