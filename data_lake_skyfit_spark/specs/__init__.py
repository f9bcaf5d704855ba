from .base import ChildSpec, EntitySpec, get_spec, register_spec, spec_registry

__all__ = ["ChildSpec", "EntitySpec", "get_spec", "register_spec", "spec_registry"]
