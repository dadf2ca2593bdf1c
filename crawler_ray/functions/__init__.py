"""Pure scalar / per-record functions shared by the serial oracle and the
Ray Data stages.  Everything here is deterministic and side-effect free."""
