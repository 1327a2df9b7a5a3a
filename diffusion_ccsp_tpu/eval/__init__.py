from diffusion_ccsp_tpu.eval.evaluate import (
    EvalResult,
    evaluate_model,
    evaluate_qualitative,
    make_sample_and_check,
    satisfied_fn_for_mode,
)
