from dreamer_tpu.core.math import (
    symlog,
    symexp,
    twohot,
    bucket_values,
    twohot_expectation,
    gaussian_log_probability,
    bernoulli_log_probability,
    gaussian_kl,
)
from dreamer_tpu.core.dists import (
    unimix_probs,
    sample_onehot_ste,
    categorical_kl,
    tanh_normal_logprob,
    tanh_normal_sample,
    actor_mu_sigma,
)
from dreamer_tpu.core.returns import lambda_returns, update_return_scale

__all__ = [
    "symlog",
    "symexp",
    "twohot",
    "bucket_values",
    "twohot_expectation",
    "gaussian_log_probability",
    "bernoulli_log_probability",
    "gaussian_kl",
    "unimix_probs",
    "sample_onehot_ste",
    "categorical_kl",
    "tanh_normal_logprob",
    "tanh_normal_sample",
    "actor_mu_sigma",
    "lambda_returns",
    "update_return_scale",
]
