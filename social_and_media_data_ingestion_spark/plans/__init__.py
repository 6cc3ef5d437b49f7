"""Query plans: the operator-inventory registry graded by the driver."""
