#!/usr/bin/env python
"""Extract skeleton reference data from the upstream repo's UE4-exported YAML files
into compact JSON shipped with this package.

The numbers are facts about the CARLA pedestrian skeletons (UE4 exports), originally at
reference: src/pedestrians_video_2_carla/data/carla/files/*.yaml

Run once at development time:
    python tools/extract_reference_data.py
"""
import json
import os

import yaml

REF = "/root/reference/src/pedestrians_video_2_carla/data/carla/files"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "pedestrians_video_2_carla_tpu", "skeletons", "files")
TEST_OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def flatten_structure(node, parent, names, parents):
    (name, children) = list(node.items())[0]
    idx = len(names)
    names.append(name)
    parents.append(parent)
    if children:
        for child in children:
            flatten_structure(child, idx, names, parents)


def transforms_to_json(transforms):
    out = {}
    for bone, t in transforms.items():
        out[bone] = {
            "location": [t["location"]["x"], t["location"]["y"], t["location"]["z"]],
            # order: (pitch, yaw, roll) degrees, CARLA/UE4 convention
            "rotation": [t["rotation"]["pitch"], t["rotation"]["yaw"], t["rotation"]["roll"]],
        }
    return out


def main():
    os.makedirs(OUT, exist_ok=True)
    os.makedirs(TEST_OUT, exist_ok=True)

    with open(os.path.join(REF, "structure.yaml")) as f:
        structure = yaml.safe_load(f)["structure"]
    names, parents = [], []
    flatten_structure(structure[0], -1, names, parents)

    with open(os.path.join(OUT, "structure.json"), "w") as f:
        json.dump({"names": names, "parents": parents}, f, indent=1)

    poses = {}
    for key, fn in [
        ("adult_female", "sk_female_relative.yaml"),
        ("adult_male", "sk_male_relative.yaml"),
        ("child_female", "sk_girl_relative.yaml"),
        ("child_male", "sk_kid_relative.yaml"),
    ]:
        with open(os.path.join(REF, fn)) as f:
            poses[key] = transforms_to_json(yaml.safe_load(f)["transforms"])
    with open(os.path.join(OUT, "reference_poses.json"), "w") as f:
        json.dump(poses, f, indent=1)

    # golden test fixture: UE4-exported ABSOLUTE pose for the adult_female skeleton
    with open(os.path.join(REF, "sk_female_absolute.yaml")) as f:
        golden = transforms_to_json(yaml.safe_load(f)["transforms"])
    with open(os.path.join(TEST_OUT, "sk_female_absolute.json"), "w") as f:
        json.dump(golden, f, indent=1)

    print("wrote", len(names), "bones;", [n for n in names[:4]], "...")
    print("parents:", parents)


if __name__ == "__main__":
    main()
