"""Placeholder: NLOS integrator (built in a later milestone this round)."""


def render_nlos(*args, **kwargs):
    raise NotImplementedError("transient_nlos_path: implemented later this round")
