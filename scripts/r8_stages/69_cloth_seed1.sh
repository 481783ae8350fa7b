r8_train_eval cloth_seed1 cloth_hanging_multi_hepi_trpl 2400 0.2 seed=1
