from diffusion_ccsp_tpu.eval.evaluate import evaluate_qualitative, EvalResult
