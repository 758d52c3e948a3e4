from .objectives import lm_cross_entropy, stage1_llm_loss, stage2_gate_loss
from .trainer import (
    TrainState,
    cosine_schedule,
    count_trainable,
    init_split_train_state,
    init_train_state,
    combine_params,
    make_accum_apply,
    make_split_accum_apply,
    make_split_grad_step,
    make_split_train_step,
    partition_params,
    make_grad_step,
    make_optimizer,
    make_train_step,
    trainable_mask,
    tree_add,
    tree_axpy,
    tree_scale,
)
from .sampler import LengthGroupedSampler
