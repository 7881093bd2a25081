"""End-to-end pipeline compositions over the operator library."""
