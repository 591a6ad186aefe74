"""Language-driven scene editing CLI (reference edit_scene.py parity).

Example:
    python edit_scene.py --source_path data/garden \\
        --gaussians_ckpt_path output/garden/sugarfine.ply \\
        --scene_mesh_path output/garden/mesh.obj \\
        --custom_traj_name transforms_001 \\
        --edit_text "Drop 5 basketballs on the table."
"""
import argparse
import os


def get_opts():
    """Reference opt.py:10-74 flag surface."""
    p = argparse.ArgumentParser()
    p.add_argument("--source_path", type=str, default="")
    p.add_argument("--model_path", type=str, default="")
    p.add_argument("--gaussians_ckpt_path", type=str, required=True)
    p.add_argument("--scene_mesh_path", type=str, default="")
    p.add_argument("--custom_traj_name", type=str, default=None)
    p.add_argument("--anchor_frame_idx", type=int, default=0)
    p.add_argument("--scene_scale", type=float, default=1.0)
    p.add_argument("--downscale_factor", type=float, default=1.0)
    p.add_argument("--render_type", type=str, default="MULTI_VIEW",
                   choices=["MULTI_VIEW", "SINGLE_VIEW"])
    p.add_argument("--num_frames", type=int, default=1)
    p.add_argument("--max_sh_degree", type=int, default=4)
    p.add_argument("--is_uv_mesh", action="store_true")
    p.add_argument("--is_indoor_scene", action="store_true")
    p.add_argument("--waymo_scene", action="store_true")
    p.add_argument("--deva_dino_threshold", type=float, default=0.45)
    p.add_argument("--edit_text", type=str, required=True)
    p.add_argument("--blender_output_dir_name", type=str,
                   default="blender_output")
    p.add_argument("--env_map_path", type=str, default=None)
    p.add_argument("--dup_budget", type=int, default=1 << 21)
    p.add_argument("--offline_program", type=str, default=None,
                   help="path to a Python file with the edit program "
                        "(skips the GPT call)")
    p.add_argument("--emitter_mesh_path", type=str, default=None,
                   help="emitter mesh (.obj) for indoor scenes")
    p.add_argument("--white_background", action="store_true")
    p.add_argument("--quiet", action="store_true")
    # Blender-era flags accepted for drop-in CLI compatibility; the
    # in-process renderer replaces the Blender subprocess
    p.add_argument("--blender_path", type=str, default=None,
                   help="ignored (no Blender subprocess in this build)")
    p.add_argument("--blender_config_name", type=str, default=None,
                   help="ignored (edit IR JSON is written automatically)")
    return p.parse_args()


def run_scene_editing(hparams, edit_text, offline_program=None):
    from autovfx_tpu.edit.scene_representation import (
        SceneParams,
        SceneRepresentation,
    )
    from autovfx_tpu.gpt.lmp import setup_LMP

    params = SceneParams(
        **{
            k: getattr(hparams, k)
            for k in SceneParams.__dataclass_fields__
            if hasattr(hparams, k)
        }
    )
    scene = SceneRepresentation(params)
    offline = None
    if offline_program:
        with open(offline_program) as f:
            program_text = f.read()
        offline = lambda query: program_text
    lmps = setup_LMP(
        scene, offline_program=offline, waymo=hparams.waymo_scene
    )
    return lmps["plan_ui"](edit_text)


if __name__ == "__main__":
    if os.environ.get("AUTOVFX_FORCE_CPU"):
        # the axon TPU plugin ignores JAX_PLATFORMS; force via config
        # before the backend initializes (tests / debugging)
        import jax

        jax.config.update("jax_platforms", "cpu")
    hparams = get_opts()
    with open("logs_lmp_code_gen.txt", "a") as f:
        f.write(f"\n=== {hparams.edit_text}\n")
    run_scene_editing(hparams, hparams.edit_text, hparams.offline_program)
