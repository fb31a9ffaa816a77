"""Training stack: optimizer/schedules, train states, checkpointing,
evaluation, fine-tune and pre-train loops, hard-negative mining."""
