"""ROS node: live RGB-D segmentation over rospy topics.

Thin transport adapter around pipeline.streaming.SegmentationService, mirroring
ros/test_images_segmentation_transformer.py: subscribes synchronized RGB +
aligned depth (Fetch / Realsense / Azure Kinect topic layouts, ref :74-103),
runs fused two-stage inference, publishes label / refined-label / score images.

rospy is not in this image; the module import-guards it so the package stays
importable everywhere.

Usage (on a ROS machine):
  python -m unseenobjectswithmeanshift_tpu.cli.ros_node --camera realsense \
      --checkpoint ... --checkpoint-crop ...
"""

from __future__ import annotations

import argparse

import numpy as np

CAMERA_TOPICS = {
    # ref: ros/test_images_segmentation_transformer.py:74-103
    "fetch": ("/head_camera/rgb/image_raw",
              "/head_camera/depth_registered/image_raw",
              "/head_camera/rgb/camera_info"),
    "realsense": ("/camera/color/image_raw",
                  "/camera/aligned_depth_to_color/image_raw",
                  "/camera/color/camera_info"),
    "azure": ("/k4a/rgb/image_raw", "/k4a/depth_to_rgb/image_raw",
              "/k4a/rgb/camera_info"),
    "kinect": ("/camera/rgb/image_color", "/camera/depth_registered/image",
               "/camera/rgb/camera_info"),
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--camera", default="realsense", choices=sorted(CAMERA_TOPICS))
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--checkpoint-crop", default=None)
    p.add_argument("--no-depth", action="store_true")
    p.add_argument("--ucn", action="store_true",
                   help="run the legacy UCN (embedding + vMF mean shift) "
                        "networks instead of MSMFormer "
                        "(ref: ros/test_images_segmentation.py)")
    p.add_argument("--key-stride", type=int, default=1,
                   help="opt-in fast serving for the MSMFormer decoder "
                        "(NOT the parity configuration)")
    args = p.parse_args(argv)

    try:
        import rospy
        import message_filters
        from sensor_msgs.msg import Image as ImageMsg, CameraInfo
        from cv_bridge import CvBridge
    except ImportError as e:
        raise SystemExit(
            "rospy stack not available in this environment; the segmentation "
            "service itself is transport-agnostic - see "
            "pipeline/streaming.SegmentationService") from e

    import jax
    import jax.numpy as jnp
    from ..config import get_config
    from ..pipeline.streaming import SegmentationService
    from ..utils.checkpoint import (
        load_torch_state_dict, convert_msmformer_checkpoint,
        convert_ucn_checkpoint,
    )

    if args.ucn:
        if args.key_stride > 1:
            p.error("--key-stride applies to the MSMFormer decoder")
        # legacy UCN mode (ref: ros/test_images_segmentation.py): embedding
        # network + vMF mean-shift clustering, same two-stage refinement
        from ..pipeline.ucn import UCNPredictor

        cfg = get_config("ucn_rgbd_add" if not args.no_depth else "ucn_color")
        pred = UCNPredictor(cfg, dtype=jnp.bfloat16)
        convert = convert_ucn_checkpoint
    else:
        from ..pipeline.two_stage import TwoStagePredictor

        cfg = get_config("tabletop_pretrained")
        cfg_crop = get_config("crop_tabletop_pretrained")
        if args.key_stride > 1:
            cfg.decoder.key_stride = args.key_stride
            cfg_crop.decoder.key_stride = args.key_stride
        pred = TwoStagePredictor(cfg, cfg_crop, dtype=jnp.bfloat16)
        convert = convert_msmformer_checkpoint
    if args.checkpoint:
        # device_put once: converters return host numpy; numpy leaves fed to
        # a jit re-upload all weights on every frame
        v1 = jax.device_put(convert(load_torch_state_dict(args.checkpoint)))
        v2 = jax.device_put(convert(load_torch_state_dict(
            args.checkpoint_crop or args.checkpoint)))
    else:
        v1, v2 = pred.init(jax.random.PRNGKey(0), (480, 640))

    rospy.init_node("uoms_tpu_segmentation")
    bridge = CvBridge()
    rgb_topic, depth_topic, info_topic = CAMERA_TOPICS[args.camera]

    info = rospy.wait_for_message(info_topic, CameraInfo)
    K = np.asarray(info.K).reshape(3, 3)
    camera_params = {"fx": K[0, 0], "fy": K[1, 1],
                     "x_offset": K[0, 2], "y_offset": K[1, 2]}

    service = SegmentationService(pred, v1, v2, camera_params,
                                  use_depth=not args.no_depth).start()

    pub_label = rospy.Publisher("seg_label", ImageMsg, queue_size=1)
    pub_refined = rospy.Publisher("seg_label_refined", ImageMsg, queue_size=1)

    def publish(result):
        pub_label.publish(bridge.cv2_to_imgmsg(
            result["label"].astype(np.uint8)))
        pub_refined.publish(bridge.cv2_to_imgmsg(
            result["label_refined"].astype(np.uint8)))

    service.subscribe(publish)

    def callback(rgb_msg, depth_msg):
        im = bridge.imgmsg_to_cv2(rgb_msg, "bgr8")
        if depth_msg.encoding == "32FC1":
            depth = bridge.imgmsg_to_cv2(depth_msg)
        else:
            depth = bridge.imgmsg_to_cv2(depth_msg).astype(np.float32) / 1000.0
        service.feed_frame(im, depth, rgb_msg.header.frame_id)

    rgb_sub = message_filters.Subscriber(rgb_topic, ImageMsg, queue_size=2)
    depth_sub = message_filters.Subscriber(depth_topic, ImageMsg, queue_size=2)
    sync = message_filters.ApproximateTimeSynchronizer(
        [rgb_sub, depth_sub], queue_size=1, slop=0.2)
    sync.registerCallback(callback)
    rospy.spin()
    service.stop()


if __name__ == "__main__":
    main()
