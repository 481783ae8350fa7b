# two-agents seed variance test (VERDICT item 3): second seed of the
# 15M KL-stability-fix recipe; sweep picks best checkpoint by EVAL success.
r8_train_eval two_agents_seed2 rigid_insertion_two_agents_multi_hepi_trpl 5400 0.1 \
  collector.total_frames=15000000 logger.checkpoint.save_interval=10 seed=1
r8_ckpt_sweep two_agents_seed2
