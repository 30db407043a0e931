"""Pre-warm the persistent XLA compile cache used by
__graft_entry__.dryrun_multichip (the driver's multi-chip gate).

The gate compiles the full 8-virtual-device SPMD joint train step on a
1-CPU host; with a cold cache that is tens of minutes of XLA compilation.
Running this script once (it simply invokes the dryrun) populates
/root/repo/.jax_cache so the driver's run is compile-free."""
import sys

sys.path.insert(0, "/root/repo")

import __graft_entry__

if __name__ == "__main__":
    __graft_entry__.dryrun_multichip(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
