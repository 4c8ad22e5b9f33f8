"""Minimal stand-in for the `signal-slot-mp` package (not installed here).

Provides just enough surface for the reference sample-factory modules to
*import* (Learner, models, env factories). The event-loop machinery is NOT
functional — the probe scripts drive the Learner directly and never run an
EventLoop.
"""
