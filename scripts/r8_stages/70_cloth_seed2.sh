r8_train_eval cloth_seed2 cloth_hanging_multi_hepi_trpl 2400 0.2 seed=2
