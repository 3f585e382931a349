"""Strip a full TrainState checkpoint (params + opt_state + batch_stats +
step, ~3x params) down to the eval-only fields (params + batch_stats + step)
for committing — optimizer moments are useless for `--eval-only` and triple
the blob size.  `train.trainer.load_checkpoint` restores stripped files by
filling the missing opt_state from the caller's fresh state.

usage: python scripts/strip_ckpt.py <in.msgpack> <out.msgpack>
"""
import sys

from flax.serialization import msgpack_restore, msgpack_serialize


def main():
    src, dst = sys.argv[1], sys.argv[2]
    with open(src, "rb") as f:
        sd = msgpack_restore(f.read())
    kept = {k: sd[k] for k in ("params", "batch_stats", "step") if k in sd}
    dropped = sorted(set(sd) - set(kept))
    with open(dst, "wb") as f:
        f.write(msgpack_serialize(kept))
    print(f"{src} -> {dst}: kept {sorted(kept)}, dropped {dropped}")


if __name__ == "__main__":
    main()
