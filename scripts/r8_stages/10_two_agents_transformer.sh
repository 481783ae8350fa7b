# missing matrix cell: two-agents x Transformer @ reference 10M budget
# (/root/reference/configs/rigid_insertion_two_agents_multi_transformer_trpl_cfg.yaml)
r8_train_eval two_agents_transformer rigid_insertion_two_agents_multi_transformer_trpl 3600 0.1
