"""Generate the experiment-config mirror of the reference's class tree.

Every reference experiment class directory (``/root/reference/experiments/``)
gets a runnable counterpart under ``experiments/`` here, expressed in this
framework's typed config schema (core/config.py) and pointing at local buffer
paths (build with scripts/build_replay_buffer.py or scripts/prepare_synthetic.py).
The mirrored axes are the reference's own sweep axes: learning rate, padding
position, trainable pad embedding, packed sequences, 1-vs-2 double-Q
optimizers, dims, dropout, state length, q_weights/alpha, and seed-data
variants. Reference citations are in each emitted file's header.

Run:  python scripts/gen_experiment_mirror.py   (idempotent; writes
experiments/<class>/<name>/<name>.yaml exactly like the reference layout,
which the trainer treats as the experiment's output dir).
"""

from __future__ import annotations

import os
import sys

import yaml

ROOT = os.path.join(os.path.dirname(__file__), "..", "experiments")

RR_DATA = {
    "train_path": "./data/retailrocket/replay_buffer.npz",
    "val_path": "./data/retailrocket/eval_buffer.npz",
    "test_path": "./data/retailrocket/eval_buffer.npz",
    "num_items": 70852,
}
RR_METRICS = {
    "div_emb_dir": "./data/retailrocket/OG_embeddings.npy",
    "unpopular_actions_path": "./data/retailrocket/unpopular_items.json",
    "topk_cov": [1, 5, 10, 20],
    "topk_div": 1,
    "topk_hr_ndcg": [5, 10, 20],
    "topk_nov": 1,
    "nov_rew_sig": 1,
}


def ikea_data(sd: str = "sd1"):
    base = "./data/ikea" if sd == "sd1" else f"./data/ikea/{sd}"
    return {
        "train_path": f"{base}/replay_buffer_train.npz",
        "val_path": f"{base}/replay_buffer_val.npz",
        "test_path": f"{base}/replay_buffer_val.npz",
        "input_tokenizer": "./data/ikea/input_tokenizer.json",
        "output_tokenizer": "./data/ikea/output_tokenizer.json",
        "market_tokenizer": "./data/ikea/market_tokenizer.json",
        "num_items": 0,  # filled from tokenizer sizes at load
        "num_actions": 0,
    }


IKEA_METRICS = {
    "div_emb_dir": "./experiments/Final-Experiments/GRU4Rec-div-embedding-64/embedding_weights.npy",
    "unpopular_actions_path": "./data/ikea/unpopular_images.json",
    "topk_cov": [1, 6, 12],
    "topk_div": 12,
    "topk_hr_ndcg": [1, 6, 12],
    "topk_nov": 12,
    "nov_rew_sig": 1,
    "eval_at": [0.25, 0.5, 0.75, 1],
}


def emit(cls, name, ref, desc, model, train, data=None, metrics=None,
         experiment=None, actions=None):
    """Write experiments/<cls>/<name>/<name>.yaml."""
    cfg = {
        "exp_class": cls.split("/")[-1],
        "exp_name": name,
        "experiment": {
            "desc": desc,
            "seed_torch": 123,
            "seed_python": 345,
            "save_pretrained_embeddings": False,
            **(experiment or {}),
        },
        "data": dict(data if data is not None else RR_DATA),
        "train": {
            "model": model,
            "batch_size": 256,
            "val_batch_size": 2000,
            "embedding_size": 64,
            "hidden_state_size": 64,
            "state_size": 10,
            "gru_layers": 1,
            "padding_position": "end",
            "train_padding_embed": True,
            "use_packed_seq": True,
            "best_model_metric": "Val_NDCG@10",
            **train,
        },
        "metrics": dict(metrics if metrics is not None else RR_METRICS),
    }
    if actions:
        cfg["actions"] = actions
    out_dir = os.path.join(ROOT, cls, name)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.yaml")
    header = (
        f"# Mirror of reference {ref}\n"
        f"# (same sweep axes, this framework's schema). Regenerate with\n"
        f"# scripts/gen_experiment_mirror.py; build data buffers first.\n"
    )
    with open(path, "w") as fh:
        fh.write(header + yaml.safe_dump(cfg, sort_keys=False))
    return path


def main():
    n = 0

    # --- paper/GRU4Rec: padding/packing options for embedding pretraining
    # (reference experiments/paper/GRU4Rec/*/; epochs 15, lr 5e-3) ----------
    for name, pad, trainpad, packed, lr in [
        ("GRU_end_opt1", "end", True, False, 0.005),
        ("GRU_end_opt2", "end", False, False, 0.005),
        ("GRU_front_opt2", "beg", False, False, 0.005),
        ("GRU_opt3_packed", "end", True, True, 0.005),
        ("GRU_opt3_packed_lowerLR", "end", True, True, 0.0005),
    ]:
        emit(
            "paper/GRU4Rec", name,
            f"experiments/paper/GRU4Rec/{name}/{name}.yaml",
            "GRU model used for pretraining of the diversity embeddings",
            "gru4rec",
            dict(epochs=15, learning_rate=lr, padding_position=pad,
                 train_padding_embed=trainpad, use_packed_seq=packed),
            experiment={"save_pretrained_embeddings": True},
        )
        n += 1

    # --- paper/RetailRocket-Comparison-Val (lr 5e-3, 15-30 epochs) ---------
    for name, model, epochs in [
        ("paper_SMORL", "smorl", 30),
        ("paper_SMORL_simple_rew_round2", "smorl", 30),
        ("paper_SMORL_simple_rew_round3", "smorl", 15),
        ("paper_SQN", "sqn", 30),
        ("paper_SQN_simple_rewards", "sqn", 30),
    ]:
        tr = dict(epochs=epochs, learning_rate=0.005, gamma=0.5, alpha=1)
        if model == "smorl":
            tr["q_weights"] = [1, 1, 1]
        emit(
            "paper/RetailRocket-Comparison-Val", name,
            f"experiments/paper/RetailRocket-Comparison-Val/{name}/{name}.yaml",
            f"{model.upper()} from paper, validated on the val split"
            + (" (simple click/buy rewards)" if "simple" in name else ""),
            model, tr,
        )
        n += 1

    # --- paper/SMORL-RetailRocket: padding ablations -----------------------
    for name, pad, trainpad, packed, epochs in [
        # NOTE: the reference's front_no_train_pad yaml actually carries
        # padding_position "end" (its name is stale) — values mirrored as-is.
        ("SMORL_GRU_end_train_pad", "end", True, False, 10),
        ("SMORL_GRU_front_no_train_pad", "end", False, False, 10),
        ("SMORL_GRU_front_train_pad", "beg", True, False, 10),
        ("SMORL_GRU_paper_replica", "end", True, True, 10),
        ("SMORL_GRU_paper_replica_long", "end", True, True, 30),
    ]:
        emit(
            "paper/SMORL-RetailRocket", name,
            f"experiments/paper/SMORL-RetailRocket/{name}/{name}.yaml",
            "SMORL paper point, padding/packing ablation",
            "smorl",
            dict(epochs=epochs, learning_rate=0.005, gamma=0.5, alpha=1,
                 q_weights=[1, 1, 1], padding_position=pad,
                 train_padding_embed=trainpad, use_packed_seq=packed),
        )
        n += 1

    # --- paper/SMORL-SQN-Exps: reward-structure experiments ----------------
    # NOTE: the reference's two *-Q(s_next,a) yamls differ from their plain
    # counterparts ONLY in exp_name/desc/buffer path — the Q(s_next,a)
    # target structure never made it into a config knob there (the trainer
    # code is identical), so both variant pairs intentionally map to the
    # same trainer semantics here as well; only the reward-structure buffer
    # differs. Values below mirror the reference yamls exactly
    # (val_batch_size 5000, topk_cov [1,5]).
    for name, desc in [
        ("SQN-SMORL-OG-Reward-Struct", "SQN with the original click/buy reward structure"),
        ("SQN-SMORL-Rew1", "SQN with reward=1 for all actions"),
        ("SQN-SMORL-OG-Reward-Struct-Q(s_next,a)", "SQN with the original click/buy reward structure, Q(s_next, a) target"),
        ("SQN-SMORL-Rew1-Q(s_next,a)", "SQN with reward=1 for all actions, Q(s_next, a) target"),
    ]:
        emit(
            "paper/SMORL-SQN-Exps", name,
            f"experiments/paper/SMORL-SQN-Exps/{name}*/",
            desc, "sqn",
            dict(epochs=10, learning_rate=0.005, gamma=0.5,
                 use_packed_seq=False, val_batch_size=5000),
            metrics={**RR_METRICS, "topk_cov": [1, 5]},
        )
        n += 1

    # --- paper/SQN_RetailRocket_NoCV{,_2,_final}: the big padding x
    # optimizer sweep, with per-action-type (click/buy) metrics -------------
    variants = [
        ("SQN_GRU_paper_front", "beg", True, False),
        ("SQN_GRU_paper_opt2_end", "end", False, False),
        ("SQN_GRU_paper_opt2_front", "beg", False, False),
        ("SQN_GRU_paper_opt3_packed", "end", False, True),
        ("SQN_GRU_paper_replica", "end", True, False),
    ]
    acts = {
        "action_types_names": {0: "click", 1: "buy"},
        "action_to_reward": {0: 0.2, 1: 1.0},
    }
    for cls, names in [
        ("paper/SQN_RetailRocket_NoCV", [v[0] for v in variants]),
        ("paper/SQN_RetailRocket_NoCV_2",
         ["SQN_GRU_paper_front", "SQN_GRU_paper_opt2_end",
          "SQN_GRU_paper_opt2_front", "SQN_GRU_paper_replica_og_opt3",
          "SQN_GRU_paper_replica_trainable"]),
    ]:
        for name in names:
            base = {
                "SQN_GRU_paper_replica_og_opt3": ("end", False, True),
                "SQN_GRU_paper_replica_trainable": ("end", True, False),
            }.get(name) or next(v[1:] for v in variants if v[0] == name)
            pad, trainpad, packed = base
            emit(
                cls, name, f"experiments/{cls}/{name}/{name}.yaml",
                "SQN RetailRocket paper point, padding ablation, no cross-validation",
                "sqn",
                dict(epochs=10, learning_rate=0.005, gamma=0.5,
                     padding_position=pad, train_padding_embed=trainpad,
                     use_packed_seq=packed,
                     best_model_metric="Val_NDCG@10[Click]"),
                actions=acts,
            )
            n += 1
    for name, (pad, trainpad, packed) in [
        ("SQN_GRU_paper_front", ("beg", True, False)),
        ("SQN_GRU_paper_opt2_end", ("end", False, False)),
        ("SQN_GRU_paper_opt2_front", ("beg", False, False)),
        ("SQN_GRU_paper_replica_og_opt3", ("end", False, True)),
        ("SQN_GRU_paper_replica_trainable", ("end", True, False)),
    ]:
        for n_opt in (1, 2):
            full = name + ("_2_optimizers" if n_opt == 2 else "")
            emit(
                "paper/SQN_RetailRocket_NoCV_final", full,
                f"experiments/paper/SQN_RetailRocket_NoCV_final/{full}/{full}.yaml",
                f"SQN padding ablation, {n_opt} Adam(s) over the double-Q nets",
                "sqn",
                dict(epochs=10, learning_rate=0.005, gamma=0.5,
                     padding_position=pad, train_padding_embed=trainpad,
                     use_packed_seq=packed, double_q_optimizers=n_opt,
                     best_model_metric="Val_NDCG@10[Click]"),
                actions=acts,
            )
            n += 1

    # --- RetailRocket-Comparison/SQN_paper_smallerLR -----------------------
    emit(
        "RetailRocket-Comparison", "SQN_paper_smallerLR",
        "experiments/RetailRocket-Comparison-Test/SQN_paper_smallerLR/SQN_paper_smallerLR.yaml",
        "SQN paper replica at lr 5e-3 (vs 1e-2)",
        "sqn", dict(epochs=30, learning_rate=0.005, gamma=0.5),
    )
    n += 1

    # --- IKEA/Hyperparameter-Tuning: lr x gamma x seed-data sweep ----------
    def ikea_train(model, lr, epochs=8, **kw):
        tr = dict(
            epochs=epochs, learning_rate=lr, val_batch_size=5000,
            best_model_metric="Val_NDCG@12", gamma=0.5,
        )
        if model == "smorl":
            tr.update(alpha=1, q_weights=[1, 1, 1])
        tr.update(kw)
        return tr

    tuning = [
        ("GRU4Rec-lr-0001", "gru4rec", ikea_train("gru4rec", 0.0001), "sd1"),
        ("GRU4Rec-lr-0005", "gru4rec", ikea_train("gru4rec", 0.0005), "sd1"),
        ("GRU4Rec-lr-001", "gru4rec", ikea_train("gru4rec", 0.001), "sd1"),
        ("GRU4Rec-lr-001-trainpad", "gru4rec",
         ikea_train("gru4rec", 0.001, train_padding_embed=True), "sd1"),
        ("GRU4Rec-lr-01", "gru4rec", ikea_train("gru4rec", 0.01), "sd1"),
        ("SMORL-lr-001-sd1", "smorl", ikea_train("smorl", 0.001), "sd1"),
        ("SMORL-lr-001-sd1-LONG", "smorl",
         ikea_train("smorl", 0.001, epochs=12), "sd1"),
        ("SMORL-lr-001-sd2", "smorl", ikea_train("smorl", 0.001), "sd2"),
        ("SMORL-lr-001-sd2-alpha5-133-divnovfirst", "smorl",
         ikea_train("smorl", 0.001, alpha=5, q_weights=[1, 3, 3]), "sd2"),
        ("SMORL-lr-001-sdall", "smorl", ikea_train("smorl", 0.001), "sd_all"),
        ("SQN-gamma05-lr0005-sdall", "sqn",
         ikea_train("sqn", 0.0005), "sd_all"),
        ("SQN-gamma05-lr001-sd1", "sqn", ikea_train("sqn", 0.001), "sd1"),
        ("SQN-gamma05-lr001-sd2", "sqn", ikea_train("sqn", 0.001), "sd2"),
        ("SQN-gamma05-lr001-sdall", "sqn", ikea_train("sqn", 0.001), "sd_all"),
        ("SQN-gamma05-lr01-sdall", "sqn", ikea_train("sqn", 0.01), "sd_all"),
    ]
    for name, model, tr, sd in tuning:
        emit(
            "IKEA/Hyperparameter-Tuning", name,
            f"experiments/IKEA/Hyperparameter-Tuning/{name}.yaml",
            f"{model} hyperparameter tuning on IKEA seed-data '{sd}'",
            model, tr, data=ikea_data(sd), metrics=IKEA_METRICS,
            experiment={"seed_torch": 510, "seed_python": 225},
        )
        n += 1

    # --- IKEA/Test-Runs: 4 x {gru4rec, smorl, sqn} smoke runs --------------
    for i in range(1, 5):
        for name, model in [
            (f"GRU4Rec-Test{i}-lr-001", "gru4rec"),
            (f"SMORL-Test{i}-lr-001-sd1", "smorl"),
            (f"SQN-Test{i}-lr001-sd1", "sqn"),
        ]:
            emit(
                "IKEA/Test-Runs", name,
                f"experiments/IKEA/Test-Runs/{name}.yaml",
                f"IKEA pipeline test run #{i}",
                model, ikea_train(model, 0.001),
                data=ikea_data(), metrics=IKEA_METRICS,
            )
            n += 1

    # --- IKEA/first_runs: dimension exploration ----------------------------
    firsts = [
        ("IKEA_GRU_first", "gru4rec", dict()),
        ("IKEA_GRU_first_smallerLR", "gru4rec", dict(learning_rate=0.0005)),
        ("IKEA_GRU_embed_solo", "gru4rec", dict(embedding_size=128)),
        ("IKEA_GRU_hidden_solo", "gru4rec", dict(hidden_state_size=128)),
        ("IKEA_GRU_higher_dim", "gru4rec",
         dict(embedding_size=128, hidden_state_size=128)),
        ("IKEA_GRU_right_tokenizer", "gru4rec", dict()),
        ("IKEA_GRU_right_tokenizer_smallerBS", "gru4rec",
         dict(batch_size=64, epochs=5, learning_rate=0.0005)),
        ("IKEA_GRU_right_tokenizer_smallerLR", "gru4rec",
         dict(learning_rate=0.0001)),
        ("IKEA_example_local_testing", "gru4rec",
         dict(epochs=2, learning_rate=0.01, val_batch_size=1000)),
        ("Online_example", "gru4rec", dict()),
        ("SMORL_first", "smorl", dict(epochs=1, learning_rate=0.0005)),
        ("SQN_first_higerDims", "sqn",
         dict(learning_rate=0.0005, embedding_size=128,
              hidden_state_size=128)),
    ]
    for name, model, kw in firsts:
        emit(
            "IKEA/first_runs", name,
            f"experiments/IKEA/first_runs/{name}.yaml",
            "IKEA first exploration runs",
            model, ikea_train(model, 0.001, **kw),
            data=ikea_data(), metrics=IKEA_METRICS,
        )
        n += 1

    # --- IKEA/State-Length-Exp: BidirGRU dropout/dim variants --------------
    for name, state, drop, dim, layers in [
        ("BidirGRU-s20-d03", 20, 0.3, 64, 1),
        ("BidirGRU-s20-d035-128-onelayer", 20, 0.35, 128, 1),
        ("BidirGRU-s20-d035-128-onelayer-twoGRUlay", 20, 0.35, 128, 2),
        ("BidirGRU-s20-d05-128", 20, 0.5, 128, 1),
        ("BidirGRU-s20-d05", 20, 0.5, 64, 1),
        ("BidirGRU-s5-d03", 5, 0.3, 64, 1),
    ]:
        emit(
            "IKEA/State-Length-Exp", name,
            f"experiments/IKEA/State-Length-Exp/{name}.yaml",
            "Bidirectional GRU state-length / dropout / width experiment",
            "bidir_gru4rec",
            ikea_train("bidir_gru4rec", 0.0005, state_size=state,
                       dropout=drop, embedding_size=dim,
                       hidden_state_size=dim, gru_layers=layers),
            data=ikea_data(), metrics=IKEA_METRICS,
        )
        n += 1

    # --- IKEA/State-Length-Exp: GRU4Rec state-length sweep -----------------
    for state in (1, 2, 3, 5, 10, 20):
        emit(
            "IKEA/State-Length-Exp", f"GRU4Rec-s{state}-lr001",
            f"experiments/IKEA/State-Length-Exp/GRU4Rec-s{state}-lr001.yaml",
            f"GRU4Rec at state length {state}",
            "gru4rec",
            ikea_train("gru4rec", 0.001, state_size=state),
            data=ikea_data(), metrics=IKEA_METRICS,
        )
        n += 1

    # --- IKEA/final_experiments: the headline IKEA runs --------------------
    # (reference experiments/IKEA/final_experiments/*.yaml; epochs 8,
    # val_batch 5000, Val_NDCG@12 selection; per-file lr/dims/q_weights
    # mirrored from each file's train block)
    def final_emit(name, model, desc, seeds=(118, 311), **kw):
        emit(
            "IKEA/final_experiments", name,
            f"experiments/IKEA/final_experiments/{name}.yaml",
            desc, model,
            ikea_train(model, kw.pop("learning_rate", 0.0005), **kw),
            data=ikea_data(), metrics=IKEA_METRICS,
            experiment={"seed_torch": seeds[0], "seed_python": seeds[1],
                        "save_pretrained_embeddings": True},
        )

    final_emit("GRU4Rec-paper", "gru4rec", "GRU4Rec", seeds=(111, 222))
    final_emit("GRU4Rec-paper-state5", "gru4rec",
               "GRU4Rec with state len 5", state_size=5)
    final_emit("GRU4Rec-paper-state20", "gru4rec",
               "GRU4Rec with state len 20", state_size=20)
    final_emit("GRU4Rec-paper-state20-trainpad", "gru4rec",
               "GRU4Rec with state len 20, unpacked", state_size=20,
               use_packed_seq=False)
    final_emit("GRU4Rec-paper-state20-2layers", "gru4rec",
               "GRU4Rec with state len 20, 2 GRU layers", state_size=20,
               embedding_size=128, gru_layers=2)
    final_emit("GRU4Rec-div-embedding-64", "gru4rec",
               "GRU4Rec training for diversity embeddings size 64",
               seeds=(123, 345))
    final_emit("GRU4Rec-div-embedding-128", "gru4rec",
               "GRU4Rec training for diversity embeddings size 128",
               seeds=(123, 345), embedding_size=128)
    final_emit("BidirGRU-10", "bidir_gru4rec", "BidirGRU4Rec",
               seeds=(111, 222))
    final_emit("BidirGRU-10-005", "bidir_gru4rec",
               "BidirGRU4Rec at lr 5e-3", seeds=(111, 222),
               learning_rate=0.005)
    # the reference BidirGRU-state20.yaml still carries state_size 10 (its
    # name is stale) — mirrored as-is
    final_emit("BidirGRU-state20", "bidir_gru4rec",
               "BidirGRU4Rec (state20 in name only; reference carries 10)",
               seeds=(111, 222))
    final_emit("SQN-paper", "sqn", "First run of SQN.", gamma=0.5)
    for name, lr, alpha, qw in [
        ("SMORL-paper", 0.0005, 1, [1, 1, 1]),
        ("SMORL-paper-newRewState", 0.001, 1, [1, 1, 1]),
        ("SMORL-NovDiv", 0.001, 1, [0, 1, 1]),
        ("SMORL-NovDiv-x5", 0.001, 5, [0, 1, 1]),
        ("SMORL-NovDiv-x5-rewfirst", 0.001, 5, [0, 1, 1]),
        ("SMORL-NovDiv-x150-rewfirst", 0.001, 150, [0, 1, 1]),
        ("SMORL-Novx10", 0.001, 10, [0, 0, 1]),
        ("SMORL-Novx100-rewfirst", 0.001, 100, [0, 0, 1]),
    ]:
        final_emit(name, "smorl", "First run of SMORL.",
                   learning_rate=lr, gamma=0.5, alpha=alpha, q_weights=qw)
    n += 19

    # --- paper/playing: the exploratory sandbox config ---------------------
    emit(
        "paper/playing", "play_around",
        "experiments/paper/playing/play_around.yaml",
        "Exploratory sandbox run (reference Playing_Around/Exp_99)",
        "gru4rec",
        dict(epochs=1, learning_rate=0.005, batch_size=2000,
             val_batch_size=5000, gamma=0.5, use_packed_seq=False,
             best_model_metric="Val_NDCG@10"),
        actions={"action_types_names": {0: "click", 1: "buy"},
                 "action_to_reward": {0: 0.2, 1: 1.0}},
    )
    n += 1

    # --- IKEA templates (reference IKEA/*-templ.yaml, exp_adam_*) ----------
    for name, model, kw in [
        ("GRU4Rec-templ", "gru4rec", dict()),
        ("SQN-templ", "sqn", dict()),
        ("exp_adam_SMORL-64", "smorl", dict()),
        # reference "QSLATE" tester is a SlateQ exploration — its nearest
        # relative in the shipped families is the multi-head Q net (SARM)
        ("exp_adam_QSLATE-tester-64", "sarm", dict()),
    ]:
        emit(
            "IKEA/templates", name,
            f"experiments/IKEA/{name}.yaml",
            "IKEA config template",
            model, ikea_train(model, 0.001, **kw),
            data=ikea_data(), metrics=IKEA_METRICS,
        )
        n += 1

    print(f"emitted {n} configs")
    # validate all of them load through the typed schema
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from ikea_recommender_tpu.core.config import load_experiment_config

    bad = []
    for dirpath, _dirs, files in os.walk(ROOT):
        for f in files:
            if f.endswith(".yaml"):
                try:
                    load_experiment_config(os.path.join(dirpath, f))
                except Exception as e:  # pragma: no cover
                    bad.append((os.path.join(dirpath, f), str(e)))
    if bad:
        for p, e in bad:
            print(f"INVALID {p}: {e}")
        sys.exit(1)
    print("all experiment configs load through core.config")


if __name__ == "__main__":
    main()
