"""Lens / dataset factories keyed by the reference YAML schema
(reference dff/factory.py)."""
from __future__ import annotations

from ..psfnet import PSFNet, ThinLens
from .dataset import FlyingThings3D, Matterport3D, Middlebury, RealWorld


def get_lens(args):
    ks = args["ks"]
    sensor_res = tuple(args["res"])

    def build(section):
        name = args[section]["lens"]
        if name == "thinlens":
            sensor_size = [float(i) for i in args[section]["sensor_size"]]
            return ThinLens(
                foc_len=args[section]["foc_len"], fnum=args[section]["fnum"],
                kernel_size=ks, sensor_size=sensor_size, sensor_res=sensor_res,
            )
        lens = PSFNet(filename=name, sensor_res=sensor_res, kernel_size=ks)
        lens.load_net(args[section]["psfnet_path"])
        return lens

    return build("train"), build("test")


def get_dataset(args):
    train_name = args["train"]["dataset"]
    if train_name == "Matterport3D":
        train_set = Matterport3D(args["train_aif_dir"], args["train_depth_dir"],
                                 resize=args["res"])
    elif train_name == "FlyingThings3D":
        train_set = FlyingThings3D(args["FlyingThings3D_train"], resize=args["res"])
    elif train_name == "SynthMiddlebury":
        # procedural textures over real Middlebury depth maps
        # (scripts/make_synth_dataset.py); augmentation on
        train_set = Middlebury(args["SynthMiddlebury_train"], resize=args["res"],
                               train=True)
    else:
        raise NotImplementedError(train_name)

    test_name = args["test"]["dataset"]
    if test_name == "Middlebury2014":
        test_set = Middlebury(args["Middlebury2014_val"], resize=args["res"], train=False)
    elif test_name == "Middlebury2021":
        test_set = Middlebury(args["Middlebury2021_val"], resize=args["res"], train=False)
    elif test_name == "RealWorld":
        test_set = RealWorld(args["RealWorld_val"], resize=args["res"], depth=False)
    elif test_name == "SynthMiddlebury":
        test_set = Middlebury(args["SynthMiddlebury_val"], resize=args["res"],
                              train=False)
    else:
        raise NotImplementedError(test_name)
    return train_set, test_set
