# missing matrix cell: pushing x EMPN @ 30M (longest of the four, ~100 min)
r8_train_eval pushing_empn rigid_pushing_multi_empn_trpl 9000 0.1
