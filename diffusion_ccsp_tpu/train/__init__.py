from diffusion_ccsp_tpu.train.data import GraphDataset, generate_qualitative_dataset
from diffusion_ccsp_tpu.train.trainer import Trainer, TrainConfig, TrainState
