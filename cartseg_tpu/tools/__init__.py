"""Human-in-the-loop annotation tools (reference L7) — host-side
OpenCV/SAM tooling with the proposal model running on TPU."""
