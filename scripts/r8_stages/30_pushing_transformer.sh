# missing matrix cell: pushing x Transformer @ 30M
r8_train_eval pushing_transformer rigid_pushing_multi_transformer_trpl 3600 0.1
