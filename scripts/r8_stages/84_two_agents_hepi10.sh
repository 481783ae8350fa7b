# budget-matched HEPi row for the two-agents comparison (VERDICT item 4):
# stable config at the reference 10M budget (existing rows are 15M).
# Checkpoint sweep dropped round-5: the seed-1 15M sweep already maps the
# checkpoint landscape; this row only needs train+eval in the tight tail.
r8_train_eval two_agents_hepi10 rigid_insertion_two_agents_multi_hepi_trpl 3600 0.1 \
  logger.checkpoint.save_interval=10
