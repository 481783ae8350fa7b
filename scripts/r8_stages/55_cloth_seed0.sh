# cloth flagship refresh on shipped code (seed 0) + seeds 1,2 for error bars
r8_train_eval cloth_seed0 cloth_hanging_multi_hepi_trpl 2400 0.2
