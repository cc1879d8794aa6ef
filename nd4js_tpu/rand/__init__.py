from .rng import RNG, rand_normal, rand_ortho

__all__ = ["RNG", "rand_normal", "rand_ortho"]
