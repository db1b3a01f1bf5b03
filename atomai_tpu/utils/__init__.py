"""Utility layer (reference surface: `atomai/utils/__init__.py:1-8`)."""

from .preproc import (num_classes_from_labels, check_image_dims,
                      check_signal_dims, format_image, format_spectra,
                      data_split, to_onehot, create_batches, stack_batches,
                      prepare_gp_input, as_channel_last_images,
                      squeeze_mask_channels)
from .coords import (find_com, grid2xy, imcoordgrid, transform_coordinates,
                     get_nn_distances, get_nn_distances_, gaussian_2d,
                     peak_refinement, get_intensities, compare_coordinates,
                     cluster_coord, find_coord_clusters, subimg_trajectories,
                     map_bonds, remove_edge_coord,
                     get_lengthscale_constraints)
from .img import (img_resize, cv_resize, cv_resize_stack, cv_rotate,
                  img_pad, get_imgstack, extract_subimages,
                  extract_random_subimages, extract_patches,
                  extract_patches_2d, extract_patches_and_spectra, FFTmask,
                  FFTsub, threshImg, crop_borders, get_coord_grid,
                  cv_thresh, filter_cells, get_blob_params, load_image,
                  get_contours)
from .nn import (average_weights, sample_weights, set_train_rng,
                 weights_init, reset_bnorm, num_params, combine_classes,
                 renumerate_classes, mock_forward, get_nb_classes,
                 get_downsample_factor, gpu_usage_map)
from .imgen import (MakeAtom, create_lattice_mask,
                    create_multiclass_lattice_mask, create_atom_mask_pair,
                    make_lattice_stack)
from . import viz
from .viz import plot_losses, plot_coord, draw_boxes
from . import graphx
from .graphx import (Graph, Node, get_interatomic_r, find_cycles,
                     find_cycle_clusters, filter_subgraphs, plot_graph)
from .aseutils import ase_obj_basic, ase_obj_adv
from . import datasets
from . import compat
from .compat import (torch_format_image, torch_format_spectra, torch_format,
                     train_test_split, array2list, array2list_,
                     get_array_memsize, init_dataloader, init_dataloaders,
                     init_fcnn_dataloaders, init_imspec_dataloaders,
                     init_reg_dataloaders, init_cls_dataloaders,
                     init_vae_dataloaders, preprocess_training_image_data,
                     preprocess_training_imspec_data,
                     preprocess_training_reg_data,
                     preprocess_training_cls_data, preprocess_denoiser_data,
                     preprocess_training_image_data_,
                     preprocess_training_imspec_data_,
                     preprocess_training_reg_data_,
                     preprocess_training_cls_data_,
                     load_weights, Hook, set_seed_and_precision,
                     dummy_optimizer, nb_filters_classes, channels2indices,
                     combine_classes_, animation_from_png,
                     plot_lattice_bonds, plot_trajectories,
                     plot_transitions, visualize_unmixing_results)

__all__ = [
    "num_classes_from_labels", "check_image_dims", "check_signal_dims",
    "format_image", "format_spectra", "data_split", "to_onehot",
    "create_batches", "stack_batches", "prepare_gp_input",
    "as_channel_last_images", "squeeze_mask_channels", "find_com",
    "grid2xy", "imcoordgrid", "transform_coordinates", "get_nn_distances",
    "get_nn_distances_", "gaussian_2d", "peak_refinement",
    "get_intensities", "compare_coordinates", "cluster_coord",
    "find_coord_clusters", "subimg_trajectories", "map_bonds",
    "remove_edge_coord", "get_lengthscale_constraints", "img_resize",
    "cv_resize", "cv_resize_stack", "cv_rotate", "img_pad", "get_imgstack",
    "extract_subimages", "extract_random_subimages", "extract_patches",
    "extract_patches_2d", "extract_patches_and_spectra", "FFTmask",
    "FFTsub", "threshImg", "crop_borders", "get_coord_grid", "cv_thresh",
    "filter_cells", "get_blob_params", "load_image", "get_contours", "average_weights",
    "sample_weights", "set_train_rng", "weights_init", "reset_bnorm",
    "num_params", "combine_classes", "renumerate_classes", "MakeAtom",
    "create_lattice_mask", "create_multiclass_lattice_mask",
    "create_atom_mask_pair", "make_lattice_stack", "viz", "plot_losses",
    "plot_coord", "draw_boxes", "graphx", "Graph", "Node",
    "get_interatomic_r", "find_cycles", "find_cycle_clusters",
    "filter_subgraphs", "plot_graph", "ase_obj_basic", "ase_obj_adv",
    "datasets", "compat", "torch_format_image", "torch_format_spectra",
    "torch_format", "train_test_split", "array2list", "array2list_",
    "get_array_memsize", "init_dataloader", "init_dataloaders",
    "init_fcnn_dataloaders", "init_imspec_dataloaders",
    "init_reg_dataloaders", "init_cls_dataloaders", "init_vae_dataloaders",
    "preprocess_training_image_data", "preprocess_training_imspec_data",
    "preprocess_training_reg_data", "preprocess_training_cls_data",
    "preprocess_training_image_data_", "preprocess_training_imspec_data_",
    "preprocess_training_reg_data_", "preprocess_training_cls_data_",
    "preprocess_denoiser_data", "load_weights", "Hook",
    "set_seed_and_precision", "dummy_optimizer", "nb_filters_classes",
    "channels2indices", "combine_classes_", "animation_from_png",
    "plot_lattice_bonds", "plot_trajectories", "plot_transitions",
    "visualize_unmixing_results",
]
