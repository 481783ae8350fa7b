# budget-matched HEPi row for the two-agents comparison (VERDICT item 6):
# stable config at the reference 10M budget (existing row is 15M).
r8_train_eval two_agents_hepi10 rigid_insertion_two_agents_multi_hepi_trpl 3600 0.1 \
  logger.checkpoint.save_interval=10
r8_ckpt_sweep two_agents_hepi10
