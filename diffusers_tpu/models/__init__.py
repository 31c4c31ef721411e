from .attention import Attention
from .embeddings import TimestepEmbedding, Timesteps, get_timestep_embedding
from .modeling_utils import ModelMixin, convert_torch_state_dict, flatten_to_torch_state_dict
from .unets.unet_2d import UNet2DModel, UNet2DOutput
