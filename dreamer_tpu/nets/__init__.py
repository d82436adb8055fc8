from dreamer_tpu.nets.mlp import MLP
from dreamer_tpu.nets.gru import GRUCell
from dreamer_tpu.nets.wm_nets import WMNets
from dreamer_tpu.nets.actor_critic import Actor, Critic

__all__ = ["MLP", "GRUCell", "WMNets", "Actor", "Critic"]
