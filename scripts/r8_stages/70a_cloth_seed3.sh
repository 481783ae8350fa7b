# cloth seed 3 (round-5 re-baseline: n=5 HEAD seed distribution)
r8_train_eval cloth_seed3 cloth_hanging_multi_hepi_trpl 2400 0.2 seed=3
