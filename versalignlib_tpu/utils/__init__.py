"""Support subsystems: logging, timers, profiling, capability probes."""
