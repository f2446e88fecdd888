#!/usr/bin/env bash
# End-to-end LEARNING check: SSL pretrain on structured synthetic data
# (or, for simclr_digits, REAL scanned UCI digits) must produce a
# representation whose linear probe beats chance by a wide margin.
# Validates aug → SSL loss → optimizer → EMA → extract → probe as a
# learning system (not just "runs without NaN").
set -euo pipefail
cd "$(dirname "$0")/../.."
METHOD=${1:-simclr}          # simclr | mocov2 | byol | swav | mocov3
PROBE_CFG=tests/e2e/probe_structured.yaml
RENAME=backbone
BAR=0.5
case "$METHOD" in
  simclr) CFG=tests/e2e/simclr_structured.yaml; PREFIX=backbone ;;
  simclr_digits)  # REAL data: sklearn's 1797 scanned UCI digits
          CFG=tests/e2e/simclr_digits.yaml; PREFIX=backbone
          PROBE_CFG=tests/e2e/probe_digits.yaml; BAR=0.85 ;;
  mocov2) CFG=tests/e2e/mocov2_structured.yaml; PREFIX=encoder_q/backbone ;;
  mocov2_digits)  # REAL data: queue + momentum encoder on scanned digits
          CFG=tests/e2e/mocov2_digits.yaml; PREFIX=encoder_q/backbone
          PROBE_CFG=tests/e2e/probe_digits.yaml; BAR=0.85 ;;
  byol)   CFG=tests/e2e/byol_structured.yaml;   PREFIX=online/backbone ;;
  byol_digits)    # REAL data: EMA target tower on scanned digits
          CFG=tests/e2e/byol_digits.yaml; PREFIX=online/backbone
          PROBE_CFG=tests/e2e/probe_digits.yaml; BAR=0.85 ;;
  supervised_digits)  # REAL data: plain supervised classification path
          CFG=tests/e2e/supervised_digits.yaml; PREFIX=__supervised_plain__
          BAR=0.93 ;;
  swav)   CFG=tests/e2e/swav_structured.yaml;   PREFIX=backbone ;;
  mocov3) CFG=tests/e2e/mocov3_structured.yaml; PREFIX=base/encoder
          PROBE_CFG=tests/e2e/probe_mocov3_structured.yaml; RENAME=encoder ;;
  mocov3_moe) CFG=tests/e2e/mocov3_moe_structured.yaml; PREFIX=base/encoder
          PROBE_CFG=tests/e2e/probe_mocov3_moe_structured.yaml; RENAME=encoder ;;
  dino)   CFG=tests/e2e/dino_structured.yaml; PREFIX=student/backbone
          PROBE_CFG=tests/e2e/probe_dino_structured.yaml; RENAME=encoder ;;
  mae)    CFG=tests/e2e/mae_structured.yaml; PREFIX=__mae__
          PROBE_CFG=tests/e2e/probe_mae_structured.yaml ;;
  simsiam) CFG=tests/e2e/simsiam_structured.yaml; PREFIX=encoder/backbone ;;
  convmae) CFG=tests/e2e/convmae_structured.yaml; PREFIX=__convmae__
          PROBE_CFG=tests/e2e/probe_convmae_structured.yaml ;;
  dinov2) CFG=tests/e2e/dinov2_structured.yaml; PREFIX=student/backbone
          PROBE_CFG=tests/e2e/probe_dinov2_structured.yaml; RENAME=encoder ;;
  densecl) CFG=tests/e2e/densecl_structured.yaml; PREFIX=encoder_q/backbone ;;
  mocobyol) CFG=tests/e2e/mocobyol_structured.yaml; PREFIX=online/backbone ;;
  pixpro) CFG=tests/e2e/pixpro_structured.yaml; PREFIX=encoder/backbone ;;
  fastmoco) CFG=tests/e2e/fastmoco_structured.yaml; PREFIX=online/backbone ;;
  clip)   CFG=tests/e2e/clip_structured.yaml; PREFIX=__clip__ ;;
  beit)   CFG=tests/e2e/beit_structured.yaml; PREFIX=encoder; RENAME=encoder
          PROBE_CFG=tests/e2e/probe_beit_structured.yaml ;;
  cae)    CFG=tests/e2e/cae_structured.yaml; PREFIX=__cae__
          PROBE_CFG=tests/e2e/probe_cae_structured.yaml ;;
  vmoe)   CFG=tests/e2e/vmoe_structured.yaml; PREFIX=__supervised__ ;;
  *) echo "unknown method $METHOD"; exit 2 ;;
esac
OUT=/tmp/passl_learning_$METHOD
rm -rf "$OUT"
mkdir -p "$OUT"

if [ "$PREFIX" = "__supervised_plain__" ]; then
  # plain supervised check (real data): the model IS the classifier —
  # no extract/probe, no router to audit. PASS = held-out top1 > BAR.
  python -m passl_tpu.tools.train -c "$CFG" \
    -o Global.output_dir="$OUT/train" | tee "$OUT/train.log"
  top1=$(grep -oE "top1: [0-9.]+" "$OUT/train.log" | tail -1 | awk '{print $2}')
  echo "FINAL supervised top1: $top1 (chance = 0.10, bar = $BAR)"
  python -c "import sys; sys.exit(0 if float('$top1') > float('$BAR') else 1)"
  echo "LEARNING CHECK PASSED"
  exit 0
fi

if [ "$PREFIX" = "__supervised__" ]; then
  # supervised sparse-expert check: the model IS the classifier — no
  # extract/probe. PASS = held-out top1 far above chance AND the router
  # did not collapse (moe_balance = E*sum(f*P), 1.0 when balanced)
  python -m passl_tpu.tools.train -c "$CFG" \
    -o Global.output_dir="$OUT/train" | tee "$OUT/train.log"
  top1=$(grep -oE "top1: [0-9.]+" "$OUT/train.log" | tail -1 | awk '{print $2}')
  bal=$(grep -oE "moe_balance: [0-9.]+" "$OUT/train.log" | tail -1 | awk '{print $2}')
  echo "FINAL supervised top1: $top1 (chance = 0.10), router balance: $bal"
  python -c "import sys; sys.exit(0 if float('$top1') > 0.9 and float('$bal') < 1.5 else 1)"
  echo "LEARNING CHECK PASSED"
  exit 0
fi

if [ "$METHOD" = "beit" ] || [ "$METHOD" = "cae" ]; then
  # stage 0: train the dVAE tokenizer the masked-token objective needs,
  # then wrap its params under tokenizer/ for the pretrain config
  python -m passl_tpu.tools.train -c tests/e2e/dvae_structured.yaml \
    -o Global.output_dir="$OUT/dvae"
  python - "$OUT" <<'PYEOF'
import sys
from flax import serialization, traverse_util
from passl_tpu.utils import io

out = sys.argv[1]
state = serialization.msgpack_restore(open(f"{out}/dvae/latest.ckpt", "rb").read())
flat = traverse_util.flatten_dict(state["params"], sep="/")
keep = {f"tokenizer/{k}": v for k, v in flat.items()}
io.save_params(traverse_util.unflatten_dict(keep, sep="/"), f"{out}/tokenizer.params")
print(f"dVAE tokenizer extract: {len(keep)} tensors")

# collapse guard: a usable tokenizer must spread the synthetic set over
# many codes (single-code collapse makes the BEiT/CAE token loss
# trivial and the whole check vacuous)
import numpy as np
import jax.numpy as jnp
from passl_tpu.models.discrete_vae import DiscreteVAE
from passl_tpu.data.datasets import StructuredSyntheticDataset

tok = DiscreteVAE(vocab_size=512, hidden_dim=128, num_resblocks=1)
ds = StructuredSyntheticDataset(size=32, image_size=32, num_classes=10,
                                noise=0.2, with_label=False)
imgs = np.stack([np.asarray(ds[i], np.float32) for i in range(32)]) / 255.0
ids = np.asarray(tok.apply({"params": traverse_util.unflatten_dict(flat, sep="/")},
                           jnp.asarray(imgs), method=tok.tokenize))
used = len(np.unique(ids))
print(f"dVAE codebook usage on 32 images: {used}/512 codes")
assert used >= 16, f"dVAE collapsed: only {used} codes in use"
PYEOF
fi

python -m passl_tpu.tools.train -c "$CFG" \
  -o Global.output_dir="$OUT/pretrain" | tee "$OUT/pretrain.log"

if [ "$METHOD" = "mocov3_moe" ]; then
  # SSL x MoE composition: besides the probe bar below, the router must
  # not collapse (balance = E*sum(f*P); 1.0 balanced, E when collapsed)
  bal=$(grep -oE "moe_balance: [0-9.]+" "$OUT/pretrain.log" | tail -1 | awk '{print $2}')
  echo "router balance after SSL pretrain: $bal (1.0 = balanced, bar < 1.5)"
  python -c "import sys; sys.exit(0 if float('$bal') < 1.5 else 1)"
fi

if [ "$PREFIX" = "__clip__" ]; then
  # CLIP is validated by held-out text->image retrieval, not a linear
  # probe (its objective IS cross-modal alignment)
  PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}" \
    python tests/e2e/clip_retrieval_check.py "$CFG" "$OUT/pretrain/latest.ckpt"
  exit $?
fi

if [ "$PREFIX" = "__cae__" ]; then
  # CAE encoder is a plain ViT whose weights live at the checkpoint top
  # level under the same names CAEFinetune uses (patch_embed/blocks_/
  # norm) — a name-filtered copy with no rename is the whole extract
  python - "$OUT" <<'PYEOF'
import sys
from flax import serialization, traverse_util
from passl_tpu.utils import io

out = sys.argv[1]
state = serialization.msgpack_restore(open(f"{out}/pretrain/latest.ckpt", "rb").read())
flat = traverse_util.flatten_dict(state["params"], sep="/")
keep = {k: v for k, v in flat.items()
        if k.startswith(("patch_embed/", "blocks_", "norm/"))}
io.save_params(traverse_util.unflatten_dict(keep, sep="/"), f"{out}/backbone.params")
print(f"CAE extract: {len(keep)} tensors")
PYEOF
elif [ "$PREFIX" = "__convmae__" ]; then
  # ConvMAE encoder weights (conv stages + transformer stage) live at
  # the checkpoint top level; pos embeds are fixed sincos in BOTH
  # pretrain and ConvViT, so a name-filtered copy is enough
  python - "$OUT" <<'PYEOF'
import sys
from flax import serialization, traverse_util
from passl_tpu.utils import io

out = sys.argv[1]
state = serialization.msgpack_restore(open(f"{out}/pretrain/latest.ckpt", "rb").read())
flat = traverse_util.flatten_dict(state["params"], sep="/")
keep = {f"backbone/{k}": v for k, v in flat.items()
        if k.startswith(("patch_embed", "blocks1_", "blocks2_", "blocks3_"))}
io.save_params(traverse_util.unflatten_dict(keep, sep="/"), f"{out}/backbone.params")
print(f"ConvMAE extract: {len(keep)} tensors")
PYEOF
elif [ "$PREFIX" = "__mae__" ]; then
  # MAE encoder weights live at the checkpoint top level next to the
  # decoder; the probe ViT also needs norm->fc_norm and a pos_embed
  # param (MAE pretrains with a FIXED sincos embed — inject it so the
  # frozen features keep their spatial alignment)
  python - "$OUT" "$CFG" <<'PYEOF'
import sys
from flax import serialization, traverse_util
import numpy as np
from passl_tpu.models.utils.pos_embed import get_2d_sincos_pos_embed
from passl_tpu.utils import io

out = sys.argv[1]
state = serialization.msgpack_restore(open(f"{out}/pretrain/latest.ckpt", "rb").read())
flat = traverse_util.flatten_dict(state["params"], sep="/")
keep = {}
for k, v in flat.items():
    # encoder only; decoder_* dropped, pretrain 'norm' dropped (the
    # reference MAE global-pool finetune re-inits fc_norm fresh)
    if k.startswith(("patch_embed/", "cls_token", "blocks_")):
        keep[f"backbone/{k}"] = v
embed_dim = keep["backbone/cls_token"].shape[-1]
p = flat["patch_embed/proj/kernel"].shape[0]
# derive the pretrain grid from the checkpoint itself (decoder pos_embed
# token count = grid^2 + 1 cls), not a hardcoded image size — a future
# e2e config at another resolution must not silently misalign the probe
dec_pe = flat.get("decoder_pos_embed")
if dec_pe is not None:
    grid = int(round((dec_pe.shape[-2] - 1) ** 0.5))
else:  # fixed sincos never saved: fall back to the config's img_size
    import yaml
    cfg = yaml.safe_load(open(sys.argv[2]))
    grid = int(cfg["Model"].get("img_size", 32)) // p
keep["backbone/pos_embed"] = np.asarray(
    get_2d_sincos_pos_embed(embed_dim, grid, cls_token=True))[None].astype(np.float32)
io.save_params(traverse_util.unflatten_dict(keep, sep="/"), f"{out}/backbone.params")
print(f"MAE extract: {len(keep)} tensors (sincos pos_embed injected, grid {grid})")
PYEOF
else
  python -m passl_tpu.tools.extract_weights \
    --checkpoint "$OUT/pretrain/latest.ckpt" \
    --prefix "$PREFIX" --rename "$RENAME" \
    --output "$OUT/backbone.params"
fi

python -m passl_tpu.tools.train -c "$PROBE_CFG" \
  -o Global.output_dir="$OUT/probe" \
  -o Global.pretrained_model="$OUT/backbone.params" | tee "$OUT/probe.log"

top1=$(grep -oE "top1: [0-9.]+" "$OUT/probe.log" | tail -1 | awk '{print $2}')
echo "FINAL linear-probe top1: $top1 (chance = 0.10, bar = $BAR)"
python -c "import sys; sys.exit(0 if float('$top1') > float('$BAR') else 1)"
echo "LEARNING CHECK PASSED"
