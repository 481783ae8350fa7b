# cloth seed0 continuation 5M -> 10M (round-5 adjudication): does doubling
# the budget seat the cloth (success ~85%+)? If yes, 5M sits on a learning
# cliff and the r2-vs-HEAD gap is which side of it a draw lands on by 5M;
# also directly tests whether the reference's own 5M budget is simply tight
# for this task under some draws.
r8_train_eval cloth_seed0_10M cloth_hanging_multi_hepi_trpl 2400 0.2 \
  collector.total_frames=10000000 \
  logger.checkpoint.load_dir=logs/r8_cloth_seed0/cloth_hanging_hepi_trpl_26_08_21-05_10_42/checkpoints
