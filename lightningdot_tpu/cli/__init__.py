"""Command-line drivers (eval_itm / train_itm / pretrain / rerank / prepro)."""
