# missing matrix cell: two-agents x EMPN @ 10M
r8_train_eval two_agents_empn rigid_insertion_two_agents_multi_empn_trpl 5400 0.1
