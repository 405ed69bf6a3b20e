from burn_ppo_tpu.models.network import ActorCriticNetwork, make_network

__all__ = ["ActorCriticNetwork", "make_network"]
